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


def wait_until_live(timeout_s: float = 90.0, retries: int | None = None,
                    retry_wait_s: float = 120.0) -> str | None:
    """Probe the chip in a disposable SUBPROCESS with a hard timeout.

    A wedged tunnel hangs the very first backend touch indefinitely —
    even `jax.devices()` never returns — so no in-process guard can
    fire; only a killable subprocess can observe the hang. Call this
    AFTER `acquire()` (the probe itself is a tunnel client and must not
    race the caller's own later backend touch) and BEFORE importing jax
    in the calling process. Wedges are usually transient (observed
    recovery ~2-10 min), so failed probes retry with a wait.

    Returns None when healthy, else a short error string. CPU-platform
    processes return None immediately.
    """
    import subprocess
    if os.environ.get('ANERF_DEVICE_LOCK', '1') == '0' or _cpu_only():
        return None
    if retries is None:
        # tunnel wedges are transient (observed recovery 2-10 min) but
        # can outlast the default 3x(90+120)s budget; long unattended
        # jobs set ANERF_LIVENESS_RETRIES high enough to ride them out
        retries = int(os.environ.get('ANERF_LIVENESS_RETRIES', 3))
    err = None
    for attempt in range(retries):
        if attempt:
            print(f'[device_lock] {err} — retrying in {retry_wait_s:.0f}s '
                  f'({attempt}/{retries - 1} retries used)',
                  file=sys.stderr, flush=True)
            time.sleep(retry_wait_s)
        try:
            r = subprocess.run(
                [sys.executable, '-c',
                 'import jax, jax.numpy as jnp\n'
                 'x = jnp.ones((64, 64))\n'
                 'assert float((x @ x).sum()) == 64.0 * 64 * 64\n'
                 'print("LIVE", jax.devices()[0].platform)'],
                capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            err = (f'device unreachable: first backend touch hung '
                   f'>{timeout_s:.0f}s ({attempt + 1}/{retries} probes)')
            continue
        if r.returncode != 0 or 'LIVE' not in r.stdout:
            err = ('device probe failed: '
                   + (r.stderr or r.stdout).strip().splitlines()[-1][:160])
            continue
        return None
    return err


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
