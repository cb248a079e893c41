"""Import harness for the reference implementation at /root/reference.

Parity tests must exercise the REFERENCE code itself (torch), not a
builder re-write of it. The reference imports a few packages that are not
in this environment (pytorch3d, plotly, smplx, deepdish); this module
installs minimal stubs for them before putting /root/reference on
sys.path. Rotation conversions are backed by
scipy.spatial.transform.Rotation — an independent third-party oracle —
so cross-checks against our jnp implementations remain genuine.

Forward-only: the scipy-backed stubs detach to numpy, so no gradients
flow through them (parity tests compare outputs, not grads).
"""
import sys
import types

import numpy as np
import torch

_REFERENCE_ROOT = '/root/reference'


def _as_torch(x, like):
    return torch.as_tensor(np.asarray(x), dtype=like.dtype,
                           device=like.device)


def _install_stubs():
    if 'pytorch3d' in sys.modules:
        return
    from scipy.spatial.transform import Rotation

    p3dr = types.ModuleType('pytorch3d.transforms.rotation_conversions')

    def axis_angle_to_matrix(a):
        sh = a.shape[:-1]
        flat = a.detach().cpu().numpy().reshape(-1, 3).astype(np.float64)
        r = Rotation.from_rotvec(flat).as_matrix()
        return _as_torch(r.reshape(*sh, 3, 3), a)

    def matrix_to_axis_angle(m):
        sh = m.shape[:-2]
        flat = m.detach().cpu().numpy().reshape(-1, 3, 3).astype(np.float64)
        v = Rotation.from_matrix(flat).as_rotvec()
        return _as_torch(v.reshape(*sh, 3), m)

    def axis_angle_to_quaternion(a):
        sh = a.shape[:-1]
        flat = a.detach().cpu().numpy().reshape(-1, 3).astype(np.float64)
        # scipy: (x, y, z, w); pytorch3d: (w, x, y, z)
        q = Rotation.from_rotvec(flat).as_quat()
        q = np.concatenate([q[:, 3:4], q[:, :3]], axis=-1)
        # pytorch3d fixes the sign so w >= 0
        q = np.where(q[:, :1] < 0, -q, q)
        return _as_torch(q.reshape(*sh, 4), a)

    p3dr.axis_angle_to_matrix = axis_angle_to_matrix
    p3dr.matrix_to_axis_angle = matrix_to_axis_angle
    p3dr.axis_angle_to_quaternion = axis_angle_to_quaternion

    transforms = types.ModuleType('pytorch3d.transforms')
    transforms.rotation_conversions = p3dr
    pytorch3d = types.ModuleType('pytorch3d')
    pytorch3d.transforms = transforms
    sys.modules['pytorch3d'] = pytorch3d
    sys.modules['pytorch3d.transforms'] = transforms
    sys.modules['pytorch3d.transforms.rotation_conversions'] = p3dr

    plotly = types.ModuleType('plotly')
    go = types.ModuleType('plotly.graph_objects')
    plotly.graph_objects = go
    sys.modules.setdefault('plotly', plotly)
    sys.modules.setdefault('plotly.graph_objects', go)

    smplx = types.ModuleType('smplx')
    smplx.SMPL = type('SMPL', (), {})
    smplx_lbs = types.ModuleType('smplx.lbs')
    smplx_lbs.vertices2joints = lambda *a, **k: None
    smplx.lbs = smplx_lbs
    sys.modules.setdefault('smplx', smplx)
    sys.modules.setdefault('smplx.lbs', smplx_lbs)

    deepdish = types.ModuleType('deepdish')
    sys.modules.setdefault('deepdish', deepdish)

    msssim = types.ModuleType('pytorch_msssim')
    msssim.SSIM = type('SSIM', (), {'__init__': lambda self, **k: None})
    sys.modules.setdefault('pytorch_msssim', msssim)

    # configargparse is not installed; the reference only needs the
    # argparse surface plus the is_config_file kwarg
    import argparse

    class _CAParser(argparse.ArgumentParser):
        def add_argument(self, *a, **k):
            k.pop('is_config_file', None)
            return super().add_argument(*a, **k)

    capkg = types.ModuleType('configargparse')
    capkg.ArgumentParser = _CAParser
    sys.modules.setdefault('configargparse', capkg)


def import_reference(module: str):
    """Import e.g. 'core.cutoff_embedder' from /root/reference."""
    _install_stubs()
    if _REFERENCE_ROOT not in sys.path:
        # APPEND, not insert: the reference root also contains
        # run_nerf.py / run_render.py which must not shadow ours
        sys.path.append(_REFERENCE_ROOT)
    import importlib
    return importlib.import_module(module)
