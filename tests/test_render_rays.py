"""End-to-end render_rays shape/semantics tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anerf_tpu.render.raycaster import render_rays, render_mesh_density

from helpers import build_tiny, synthetic_batch


def test_render_rays_shapes(rng):
    args, cfg, params, pose = build_tiny(rng)
    batch = synthetic_batch(rng, pose)
    per_ray = lambda k: batch[k][batch['pose_idx']]
    out = render_rays(params, cfg, batch['rays'], per_ray('kp3d'),
                      per_ray('skts'), per_ray('bones'), per_ray('cyls'),
                      cam_idxs=batch['cam_idxs'],
                      rng=jax.random.PRNGKey(3), tau=jnp.float32(20.0))
    R = batch['rays'].shape[0]
    assert out['rgb_map'].shape == (R, 3)
    assert out['acc_map'].shape == (R,)
    assert out['alpha'].shape == (R, args.N_samples + args.N_importance)
    assert out['rgb0'].shape == (R, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f'{k} has non-finite values'
    assert (np.asarray(out['acc_map']) >= 0).all()
    assert (np.asarray(out['acc_map']) <= 1.0 + 1e-5).all()


def test_render_rays_single_net(rng):
    args, cfg, params, pose = build_tiny(rng, single_net=True)
    assert params['fine'] is None
    batch = synthetic_batch(rng, pose)
    per_ray = lambda k: batch[k][batch['pose_idx']]
    out = render_rays(params, cfg, batch['rays'], per_ray('kp3d'),
                      per_ray('skts'), per_ray('bones'), per_ray('cyls'),
                      cam_idxs=batch['cam_idxs'],
                      rng=jax.random.PRNGKey(3), tau=jnp.float32(20.0))
    assert np.isfinite(np.asarray(out['rgb_map'])).all()


def test_render_deterministic_in_test_mode(rng):
    args, cfg, params, pose = build_tiny(rng)
    tcfg = cfg.test_mode()
    batch = synthetic_batch(rng, pose)
    per_ray = lambda k: batch[k][batch['pose_idx']]
    o1 = render_rays(params, tcfg, batch['rays'], per_ray('kp3d'),
                     per_ray('skts'), per_ray('bones'), per_ray('cyls'),
                     rng=None, tau=jnp.float32(100.0))
    o2 = render_rays(params, tcfg, batch['rays'], per_ray('kp3d'),
                     per_ray('skts'), per_ray('bones'), per_ray('cyls'),
                     rng=None, tau=jnp.float32(100.0))
    np.testing.assert_array_equal(np.asarray(o1['rgb_map']),
                                  np.asarray(o2['rgb_map']))


def test_mesh_density_grid(rng):
    args, cfg, params, pose = build_tiny(rng)
    sigma = render_mesh_density(
        params, cfg, jnp.asarray(pose['kp3d'][:1]),
        jnp.asarray(pose['skts'][:1]), jnp.asarray(pose['bones'][:1]),
        radius=0.5, res=8)
    assert sigma.shape == (9, 9, 9)
    assert np.isfinite(np.asarray(sigma)).all()
