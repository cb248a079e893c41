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
