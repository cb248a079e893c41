"""Skeleton-relative encoders vs numpy oracles."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from anerf_tpu.ops.encoding import (calculate_angle, make_bone_encoder,
                                    make_kp_encoder, make_view_encoder,
                                    transform_batch_pts, transform_batch_rays)


def random_skts(rng, R, J):
    aa = rng.normal(size=(R * J, 3)).astype(np.float32)
    rot = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    t = rng.normal(size=(R * J, 3)).astype(np.float32)
    m = np.tile(np.eye(4, dtype=np.float32), (R * J, 1, 1))
    m[:, :3, :3] = rot
    m[:, :3, 3] = t
    return m.reshape(R, J, 4, 4)


def test_transform_batch_pts(rng):
    R, S, J = 4, 6, 24
    pts = rng.normal(size=(R, S, 3)).astype(np.float32)
    skts = random_skts(rng, R, J)
    got = np.asarray(transform_batch_pts(jnp.asarray(pts), jnp.asarray(skts)))
    # oracle: homogeneous multiply per (ray, joint, sample)
    want = np.zeros((R, S, J, 3), dtype=np.float32)
    for r in range(R):
        for j in range(J):
            ph = np.concatenate([pts[r], np.ones((S, 1))], -1)
            want[r, :, j] = (skts[r, j] @ ph.T).T[:, :3]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_transform_batch_rays(rng):
    R, J = 4, 24
    rays_d = rng.normal(size=(R, 1, 3)).astype(np.float32)
    skts = random_skts(rng, R, J)
    got = np.asarray(transform_batch_rays(jnp.asarray(rays_d),
                                          jnp.asarray(skts)))
    want = np.zeros((R, 1, J, 3), dtype=np.float32)
    for r in range(R):
        for j in range(J):
            want[r, 0, j] = skts[r, j, :3, :3] @ rays_d[r, 0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_reldist_encoder(rng):
    R, S, J = 3, 5, 24
    pts = rng.normal(size=(R, S, 3)).astype(np.float32)
    skts = random_skts(rng, R, J)
    pts_t = transform_batch_pts(jnp.asarray(pts), jnp.asarray(skts))
    spec, input_dims, cutoff_dims = make_kp_encoder('reldist')
    v = np.asarray(spec(jnp.asarray(pts), pts_t, None))
    assert v.shape == (R, S, J) and input_dims == 24 and cutoff_dims == 24
    np.testing.assert_allclose(v, np.linalg.norm(np.asarray(pts_t), axis=-1),
                               atol=1e-6)


def test_relpos_and_kpcat(rng):
    R, S, J = 2, 4, 24
    pts = rng.normal(size=(R, S, 3)).astype(np.float32)
    kps = rng.normal(size=(R, J, 3)).astype(np.float32)
    spec, dims, _ = make_kp_encoder('relpos')
    got = np.asarray(spec(jnp.asarray(pts), None, jnp.asarray(kps)))
    want = (pts[:, :, None] - kps[:, None]).reshape(R, S, J * 3)
    np.testing.assert_allclose(got, want, atol=1e-6)

    spec, dims, _ = make_kp_encoder('cat')
    got = np.asarray(spec(jnp.asarray(pts), None, jnp.asarray(kps)))
    assert got.shape == (R, S, J * 3 + 3) and dims == J * 3 + 3
    np.testing.assert_allclose(got[..., :3], pts, atol=1e-6)


def test_vecnorm_bone_encoder(rng):
    R, S, J = 2, 4, 24
    pts_t = rng.normal(size=(R, S, J, 3)).astype(np.float32)
    spec, dims = make_bone_encoder('reldir')
    got = np.asarray(spec(jnp.asarray(pts_t)))
    n = pts_t / np.linalg.norm(pts_t, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, n.reshape(R, S, J * 3), atol=1e-5)


def test_relray_view_encoder_broadcast(rng):
    R, J = 2, 24
    rays_t = rng.normal(size=(R, 1, J, 3)).astype(np.float32)
    spec, dims = make_view_encoder('relray')
    got = np.asarray(spec(jnp.asarray(rays_t)))
    assert got.shape == (R, 1, J * 3)
    n = rays_t / np.linalg.norm(rays_t, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, n.reshape(R, 1, J * 3), atol=1e-5)


def test_rayang_encoder(rng):
    R, S, J = 2, 4, 24
    pts_t = rng.normal(size=(R, S, J, 3)).astype(np.float32)
    rays_t = rng.normal(size=(R, 1, J, 3)).astype(np.float32)
    spec, dims = make_view_encoder('rayangle')
    got = np.asarray(spec(jnp.asarray(rays_t), pts_t=jnp.asarray(pts_t)))
    assert got.shape == (R, S, J) and dims == J
    # oracle
    dot = (pts_t * rays_t).sum(-1)
    cos = dot / (np.linalg.norm(pts_t, axis=-1)
                 * np.linalg.norm(rays_t, axis=-1))
    want = np.arccos(np.clip(cos, -1 + 1e-6, 1 - 1e-6)) - np.pi / 2
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flat_fast_encode_matches_spec_path(rng):
    """encode_inputs' lane-parallel flat path == the encoder-spec path."""
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import build_tiny, synthetic_batch
    from anerf_tpu.render.raycaster import encode_inputs

    args, cfg, params, pose = build_tiny(rng)
    batch = synthetic_batch(rng, pose, n_rays=8, n_images=4)
    pr = lambda k: batch[k][batch['pose_idx']]
    rays = batch['rays']
    pts = rays[:, :3][:, None] + rays[:, 3:6][:, None] * \
        jnp.linspace(1.0, 3.0, 5)[None, :, None]
    tau = jnp.float32(30.0)

    got = encode_inputs(cfg, pts, rays[:, 3:6][:, None], pr('kp3d'),
                        pr('skts'), pr('bones'), params['cutoff_dist'], tau,
                        None)

    # spec-path oracle (the pre-flat formulation)
    from anerf_tpu.ops.embedder import embed
    pts_t = transform_batch_pts(pts, jnp.asarray(pr('skts')))
    rays_t = transform_batch_rays(rays[:, 3:6][:, None],
                                  jnp.asarray(pr('skts')))
    v = np.linalg.norm(np.asarray(pts_t), axis=-1)
    r = np.asarray(pts_t) / np.linalg.norm(np.asarray(pts_t), axis=-1,
                                           keepdims=True)
    r = r.reshape(*r.shape[:2], -1)
    d = np.asarray(rays_t) / np.linalg.norm(np.asarray(rays_t), axis=-1,
                                            keepdims=True)
    d = d.reshape(*d.shape[:2], -1)
    v_e, _ = embed(cfg.embed_kp, jnp.asarray(v), dists=jnp.asarray(v),
                   cutoff_dist=params['cutoff_dist'], tau=tau)
    r_e, _ = embed(cfg.embed_bone, jnp.asarray(r), dists=jnp.asarray(v),
                   cutoff_dist=params['cutoff_dist'], tau=tau)
    d_e, _ = embed(cfg.embed_view, jnp.asarray(d), dists=jnp.asarray(v),
                   cutoff_dist=params['cutoff_dist'], tau=tau)

    np.testing.assert_allclose(np.asarray(got['v'], np.float32),
                               np.asarray(v_e), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got['r'], np.float32),
                               np.asarray(r_e), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got['d'], np.float32),
        np.broadcast_to(np.asarray(d_e), np.asarray(got['d']).shape),
        atol=1e-4)
