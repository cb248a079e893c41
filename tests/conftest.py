"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere, so environment is set at module
import time (pytest imports conftest first).
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# A pytest plugin may have imported jax before this conftest ran, in which
# case jax captured JAX_PLATFORMS at import; override through the config API
# (valid as long as no backend has been initialized yet).
import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope='session')
def smpl_tables_npz(tmp_path_factory):
    """Precomputed SMPL joint tables (synthetic model) for converter
    dry-runs; see tests/rawlayout.py and anerf_tpu/data/smpl_tables.py."""
    from rawlayout import make_smpl_tables
    return make_smpl_tables(tmp_path_factory.mktemp('smpl_tables'))


@pytest.fixture
def smpl_tables_env(smpl_tables_npz, monkeypatch):
    from anerf_tpu.data.smpl_tables import ENV_VAR
    monkeypatch.setenv(ENV_VAR, smpl_tables_npz)
    return smpl_tables_npz
