"""Sampling, compositing, and cylinder bounds vs numpy oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anerf_tpu.ops.compositing import raw2outputs
from anerf_tpu.ops.cylinder import (get_kp_bounding_cylinder,
                                    get_near_far_in_cylinder,
                                    get_near_far_in_cylinder_np)
from anerf_tpu.ops.sampling import (isample_from_lineseg, merge_sorted,
                                    sample_from_lineseg, sample_pdf)


def test_stratified_no_perturb():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = np.asarray(sample_from_lineseg(None, near, far, 9, perturb=0.0))
    np.testing.assert_allclose(z, np.broadcast_to(np.linspace(2, 6, 9), (5, 9)),
                               atol=1e-6)


def test_stratified_perturb_within_bins():
    key = jax.random.PRNGKey(0)
    near = jnp.full((64, 1), 1.0)
    far = jnp.full((64, 1), 3.0)
    z = np.asarray(sample_from_lineseg(key, near, far, 16, perturb=1.0))
    base = np.linspace(1, 3, 16)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
    assert (np.diff(z, axis=-1) > 0).all()


def test_sample_pdf_concentrates():
    # weights peaked at one bin -> samples concentrate there
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
    w = np.full((4, 11), 1e-4, dtype=np.float32)
    w[:, 5] = 1.0
    s = np.asarray(sample_pdf(jax.random.PRNGKey(1), bins, jnp.asarray(w), 64))
    frac_near_peak = np.mean(np.abs(s - 0.5) < 0.1)
    assert frac_near_peak > 0.8


def test_sample_pdf_det_uniform():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (2, 5))
    w = jnp.ones((2, 5))
    s = np.asarray(sample_pdf(None, bins, w, 9, det=True))
    assert (np.diff(s, axis=-1) >= -1e-6).all()
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_isample_merge_sorted(rng):
    key = jax.random.PRNGKey(2)
    z_vals = jnp.sort(jnp.asarray(rng.uniform(0, 1, (8, 16)).astype(np.float32)), -1)
    weights = jnp.asarray(rng.uniform(0, 1, (8, 16)).astype(np.float32))
    z_all, z_samples, sort_idxs = isample_from_lineseg(key, z_vals, weights, 8)
    z_all = np.asarray(z_all)
    assert z_all.shape == (8, 24)
    assert (np.diff(z_all, axis=-1) >= -1e-6).all()
    # merge a feature tensor the same way and check alignment with z order
    feat_c = np.asarray(z_vals)[..., None].repeat(3, -1)
    feat_f = np.asarray(z_samples)[..., None].repeat(3, -1)
    merged = np.asarray(merge_sorted(jnp.asarray(feat_c), jnp.asarray(feat_f),
                                     sort_idxs))
    np.testing.assert_allclose(merged[..., 0], z_all, atol=1e-6)


def oracle_raw2outputs(raw, z_vals, rays_d, rgb_eps=0.001):
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1 / (1 + np.exp(-raw[..., :3])) * (1 + 2 * rgb_eps) - rgb_eps
    alpha = 1 - np.exp(-np.maximum(raw[..., 3], 0) * dists)
    trans = np.cumprod(np.concatenate(
        [np.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    acc = np.minimum(weights.sum(-1), 1.0)
    return rgb_map, weights, acc


def test_raw2outputs(rng):
    R, S = 6, 12
    raw = rng.normal(size=(R, S, 4)).astype(np.float32)
    z_vals = np.sort(rng.uniform(0.5, 2.0, (R, S)).astype(np.float32), -1)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals),
                      jnp.asarray(rays_d))
    rgb_want, w_want, acc_want = oracle_raw2outputs(raw, z_vals, rays_d)
    np.testing.assert_allclose(np.asarray(out['rgb_map']), rgb_want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['weights']), w_want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['acc_map']), acc_want, atol=1e-5)


def test_cylinder_construction(rng):
    kp = rng.normal(size=(4, 24, 3)).astype(np.float32)
    cyl = get_kp_bounding_cylinder(kp, ext_scale=0.001, head='-y')
    assert cyl.shape == (4, 5)
    # radius covers all joints' ground-plane distance to the root
    for n in range(4):
        d = np.linalg.norm(kp[n][:, [0, 2]] - kp[n, 0, [0, 2]], axis=-1)
        assert cyl[n, 2] >= d.max()


def test_near_far_matches_np_twin(rng):
    R = 128
    # camera ring looking at origin
    rays_o = rng.normal(size=(R, 3)).astype(np.float32)
    rays_o[:, [0, 2]] += np.sign(rays_o[:, [0, 2]]) * 4.0
    rays_d = (-rays_o + rng.normal(size=(R, 3)) * 0.05).astype(np.float32)
    cyl = np.tile(np.array([[0.0, 0.0, 1.5, 2.0, -2.0]], np.float32), (R, 1))
    near, far = 0.35, 8.0
    got_n, got_f = get_near_far_in_cylinder(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(cyl),
        near=near, far=far)
    want_n, want_f = get_near_far_in_cylinder_np(rays_o, rays_d, cyl,
                                                 near, far)
    valid = ~np.isnan(want_n[:, 0])
    assert valid.mean() > 0.9
    np.testing.assert_allclose(np.asarray(got_n)[valid], want_n[valid],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f)[valid], want_f[valid],
                               atol=1e-4)
    # invalid rays are backfilled with finite values
    assert np.isfinite(np.asarray(got_n)).all()
    assert np.isfinite(np.asarray(got_f)).all()
