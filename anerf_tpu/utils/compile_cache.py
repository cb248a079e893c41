"""Persistent XLA compilation cache for the CLIs.

First compile of the scanned train step / bucketed renderer costs 20-40s
on a TPU; JAX's persistent compilation cache makes every later process
with the same config start instantly. The reference has no analog (torch
eager). Enabled by default from the CLIs via TrainConfig.xla_cache_dir;
harmless if the backend doesn't support it (JAX logs and moves on).
"""
from __future__ import annotations

import os
from typing import Optional

_enabled: Optional[str] = None


def enable(path: Optional[str]) -> Optional[str]:
    """Point JAX's persistent compilation cache at `path` (idempotent).

    Returns the resolved directory, or None if disabled (path falsy).
    An explicit JAX_COMPILATION_CACHE_DIR env var wins over `path`.
    """
    global _enabled
    if _enabled is not None:
        return _enabled
    env = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    path = env or path
    if not path:
        return None
    path = os.path.expanduser(path)
    try:
        import jax
        if not env and jax.default_backend() == 'cpu':
            # XLA:CPU AOT reload warns about machine-feature mismatches
            # even on one host; cache only accelerators by default (the
            # env var still forces it anywhere)
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # cache everything that takes noticeable time; tiny programs are
        # cheaper to recompile than to hash+read
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        _enabled = path
        return path
    except Exception as e:          # never let caching break a run
        print(f'compilation cache disabled ({e})')
        return None
