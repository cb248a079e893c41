"""Advisory inter-process lock serializing access to the attached chip.

A remote-attached (tunneled) TPU serializes clients at the server: a
second process touching the chip while one runs can wedge BOTH sides
(observed: a run stalled ~1 h at zero progress after losing a startup
race; even a 128x128 liveness matmul times out while another client
holds the tunnel). The reference's CUDA stack has no analog — every
process gets its own context — so on a single remote-attached chip the
serialization must happen host-side.

`acquire()` takes an exclusive `flock` on a well-known file BEFORE the
first backend touch and holds it for the process lifetime; the kernel
releases the lock on any exit (including SIGKILL), so there is no
stale-lock state to clean up. CPU-platform runs (tests, the driver's
`dryrun_multichip`) skip the lock — they never touch the tunnel.

Wired into the CLIs (`run_nerf.py`, `run_render.py`, `render_mesh.py`)
and `bench.py`; sweep scripts get it for free by going through them, or
can call `acquire()` directly. Opt out with ANERF_DEVICE_LOCK=0.
"""
from __future__ import annotations

import os
import sys
import time

_LOCK_PATH = os.environ.get('ANERF_DEVICE_LOCK_PATH',
                            '/tmp/anerf_tpu.device.lock')
_handle = None   # keeps the fd (and therefore the flock) alive


def _cpu_only() -> bool:
    """True when this process is pinned to the CPU platform (no tunnel)."""
    if os.environ.get('JAX_PLATFORMS', '').strip().lower() == 'cpu':
        return True
    try:
        import jax
        return str(jax.config.jax_platforms or '').strip().lower() == 'cpu'
    except Exception:
        return False


def acquire(timeout: float | None = None, poll_note_s: float = 30.0) -> bool:
    """Block until this process holds the device lock (idempotent).

    Returns True when the lock is held, False when skipped (CPU platform,
    opt-out env, or a platform without fcntl). Raises TimeoutError only
    when an explicit `timeout` elapses.
    """
    global _handle
    if _handle is not None:
        return True
    if os.environ.get('ANERF_DEVICE_LOCK', '1') == '0' or _cpu_only():
        return False
    try:
        import fcntl
    except ImportError:          # non-POSIX host: nothing to serialize
        return False

    fd = os.open(_LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.monotonic()
    last_note = t0
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            now = time.monotonic()
            if timeout is not None and now - t0 > timeout:
                os.close(fd)
                raise TimeoutError(
                    f'device lock {_LOCK_PATH} held by another process '
                    f'for >{timeout:.0f}s')
            if now - last_note >= poll_note_s:
                holder = ''
                try:
                    with open(_LOCK_PATH) as f:
                        holder = f.read().strip()
                except OSError:
                    pass
                print(f'[device_lock] waiting for the chip '
                      f'({now - t0:.0f}s){" — held by " + holder if holder else ""}',
                      file=sys.stderr, flush=True)
                last_note = now
            time.sleep(0.5)
    os.ftruncate(fd, 0)
    os.write(fd, f'pid={os.getpid()} argv={" ".join(sys.argv[:3])}'
             .encode())
    _handle = fd
    return True


def release() -> None:
    """Drop the lock early (normally the OS does this at exit)."""
    global _handle
    if _handle is None:
        return
    try:
        import fcntl
        fcntl.flock(_handle, fcntl.LOCK_UN)
    finally:
        os.close(_handle)
        _handle = None
