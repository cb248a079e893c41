"""Native host-side runtime components (C++, built on demand).

`get_fast_sampler()` returns the compiled extension module or None; callers
fall back to the numpy implementations in data/dataset.py. Build happens
once per environment into native/_build/ via the system compiler.
"""
from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

_cached = None
_tried = False


def build_extension(verbose: bool = False) -> Optional[str]:
    """Compile fast_sampler.cpp into a shared object; returns its path."""
    src_dir = os.path.dirname(os.path.abspath(__file__))
    build_dir = os.path.join(src_dir, '_build')
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, 'fast_sampler.so')
    src = os.path.join(src_dir, 'fast_sampler.cpp')
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(src)):
        return so_path

    include = sysconfig.get_paths()['include']
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
           f'-I{include}', src, '-o', so_path]
    try:
        subprocess.run(cmd, check=True,
                       capture_output=not verbose)
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f'native build failed: {e}')
        return None


def get_fast_sampler():
    """Import (building if needed) the native sampler, or None."""
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    so_path = build_extension()
    if so_path is None:
        return None
    import importlib.util
    spec = importlib.util.spec_from_file_location('fast_sampler', so_path)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
    except Exception:
        _cached = None
    return _cached
