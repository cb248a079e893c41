"""The advisory device lock that serializes tunnel clients (PERF.md:
two processes touching the remote-attached chip wedge each other)."""
import os
import subprocess
import sys

import pytest

from anerf_tpu.utils import device_lock


@pytest.fixture
def lock_env(tmp_path, monkeypatch):
    path = str(tmp_path / 'dev.lock')
    monkeypatch.setattr(device_lock, '_LOCK_PATH', path)
    monkeypatch.setattr(device_lock, '_cpu_only', lambda: False)
    monkeypatch.setenv('ANERF_DEVICE_LOCK', '1')
    yield path
    device_lock.release()


def test_acquire_release_roundtrip(lock_env):
    assert device_lock.acquire() is True
    assert device_lock.acquire() is True          # idempotent
    with open(lock_env) as f:
        assert f'pid={os.getpid()}' in f.read()
    device_lock.release()
    assert device_lock._handle is None
    assert device_lock.acquire() is True          # re-acquirable


def test_cpu_platform_skips(lock_env, monkeypatch):
    monkeypatch.setattr(device_lock, '_cpu_only', lambda: True)
    assert device_lock.acquire() is False
    assert device_lock._handle is None


def test_env_optout_skips(lock_env, monkeypatch):
    monkeypatch.setenv('ANERF_DEVICE_LOCK', '0')
    assert device_lock.acquire() is False


def test_second_process_blocks_then_times_out(lock_env):
    assert device_lock.acquire() is True
    child = (
        'import os, sys; sys.path.insert(0, %r);\n'
        'from anerf_tpu.utils import device_lock as dl\n'
        'dl._LOCK_PATH = %r\n'
        'dl._cpu_only = lambda: False\n'
        'try:\n'
        '    dl.acquire(timeout=1.0)\n'
        '    print("ACQUIRED")\n'
        'except TimeoutError:\n'
        '    print("TIMEOUT")\n'
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         lock_env)
    out = subprocess.run([sys.executable, '-c', child],
                         capture_output=True, text=True, timeout=120,
                         env=dict(os.environ, ANERF_DEVICE_LOCK='1'))
    assert 'TIMEOUT' in out.stdout, (out.stdout, out.stderr)
    # and after release the same child snippet succeeds
    device_lock.release()
    out = subprocess.run([sys.executable, '-c', child],
                         capture_output=True, text=True, timeout=120,
                         env=dict(os.environ, ANERF_DEVICE_LOCK='1'))
    assert 'ACQUIRED' in out.stdout, (out.stdout, out.stderr)
