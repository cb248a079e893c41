"""Multi-chip render path: sharded == single-device parity.

The reference parallelizes rendering with nn.DataParallel scatter/gather
per chunk (/root/reference/core/raycasters.py:157 + core/trainer.py:64-79);
here each render bucket's ray axis is sharded over the 1-D data mesh via a
sharding constraint inside the jitted renderer (render_path.make_render_fn).
render_rays has no cross-ray ops, so the partitioner emits zero collectives
and the outputs must match the single-device render exactly.

Runs on the 8-device virtual CPU mesh from conftest.py.
"""
import numpy as np
import pytest

import jax

from anerf_tpu.parallel.mesh import make_mesh
from anerf_tpu.render.render_path import render_path

from helpers import build_tiny


def _camera_ring(kps, n_views=2, radius=3.0):
    """NeRF-convention c2ws on a ring looking at the mean root."""
    center = kps[:, 0].mean(0)
    c2ws = []
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 1)
        eye = center + radius * np.array(
            [np.sin(ang), 0.1, np.cos(ang)], np.float32)
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0., 1., 0.], np.float32))
        right = right / np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        # NeRF convention: columns [right, up, -forward]
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
        c2w[:3, 3] = eye
        c2ws.append(c2w)
    return np.stack(c2ws)


def _wake_density(params):
    """Random-init ReLU density can be dead everywhere (zero acc), making
    the parity check vacuous — bias both density heads positive."""
    import jax
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    for net in ('coarse', 'fine'):
        if net in params and params[net] is not None:
            params[net]['alpha_linear']['b'] = (
                params[net]['alpha_linear']['b'] + 2.0)
    return params


@pytest.mark.parametrize('chunk', [256, 300])
def test_sharded_render_matches_single(rng, chunk):
    """render_path(mesh=8-dev) == render_path(mesh=None), including the
    non-divisible-chunk case (300 pads to 304 on an 8-mesh).

    The single-device control runs at the same padded chunk the sharded
    path will use, so the comparison isolates sharding (identical traced
    shapes); the pad itself is exercised inside the sharded render_path
    call which receives the raw chunk."""
    from anerf_tpu.parallel.mesh import pad_to_multiple
    args, cfg, params, pose = build_tiny(rng, n_frames=4)
    params = _wake_density(params)
    c2ws = _camera_ring(pose['kp3d'])
    H = W = 40
    hwf = (H, W, 50.0)
    kw = dict(cam_idxs=np.zeros(len(c2ws), np.int32), tau=100.0,
              white_bkgd=True, use_framecode_idx=True)

    single = render_path(params, cfg, c2ws, hwf, pose['kp3d'],
                         pose['skts'], pose['bones'],
                         chunk=pad_to_multiple(chunk, 8), **kw)
    assert single['rgbs'].shape == (2, H, W, 3)
    # the scene must actually hit the canvas or parity is vacuous
    assert single['accs'].max() > 0.01

    mesh = make_mesh()
    assert mesh.size == 8
    sharded = render_path(params, cfg, c2ws, hwf, pose['kp3d'],
                          pose['skts'], pose['bones'], mesh=mesh,
                          chunk=chunk, **kw)

    for k in ('rgbs', 'disps', 'accs'):
        np.testing.assert_allclose(sharded[k], single[k], rtol=0,
                                   atol=1e-5, err_msg=k)
    np.testing.assert_array_equal(sharded['bboxes'], single['bboxes'])


def test_sharded_render_actually_shards(rng):
    """The bucket computation must be distributed: jit with the mesh keeps
    the per-bucket ray axis sharded over all 8 devices (not replicated)."""
    from anerf_tpu.render.render_path import (make_render_fn,
                                              pack_pose_scalars)
    args, cfg, params, pose = build_tiny(rng, n_frames=4)
    mesh = make_mesh()
    fn = make_render_fn(cfg, True, mesh)

    tables = {k: jax.device_put(np.asarray(pose[k], np.float32))
              for k in ('kp3d', 'skts', 'bones', 'cyls')}
    c2w = _camera_ring(pose['kp3d'], n_views=1)[0]
    scal = pack_pose_scalars(c2w, 50.0, (20.0, 20.0), (4, 4), (36, 36),
                             0, 0, 100.0)
    out = fn(params, scal, tables['kp3d'], tables['skts'], tables['bones'],
             tables['cyls'], n_buckets=2, chunk=256)
    rgb = out['rgb_map']
    # (R,3) output produced from ray-sharded buckets: every device holds a
    # shard (device_set covers the mesh)
    assert len(rgb.sharding.device_set) == 8, rgb.sharding
