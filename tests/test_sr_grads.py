"""Stochastically-rounded bf16 cotangents (--sr_grads).

The claim under test: _sr_cast is an UNBIASED bf16 rounding
(E[sr_cast(x)] == x), the SR dense twin is forward-identical to the
deterministic fast path, and its gradient expectation over rounding keys
converges to the f32-cotangent gradients — the property that
round-to-nearest bf16 (plain --fast_grads) lacks, which is the measured
mechanism behind its ~2 dB background-PSNR loss (PERF.md).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from anerf_tpu.models.nerf import (_dense_mixed, _dense_mixed_sr, _sr_cast,
                                   apply_nerf)


def test_sr_cast_unbiased_and_exact_on_representables():
    # exactly-representable bf16 values pass through every key unchanged
    exact = jnp.float32([0.0, -0.0, 1.0, -2.5, 0.15625, 2.0 ** -64])
    for i in range(4):
        out = _sr_cast(exact, jax.random.PRNGKey(i))
        np.testing.assert_array_equal(np.float32(out), np.float32(exact))

    # non-representable values: the key-averaged cast converges to x,
    # while round-to-nearest keeps a fixed one-sided error
    x = jnp.float32(np.linspace(1.0, 2.0, 257)[1:-1])  # strictly interior
    n_keys = 2048
    cast = jax.jit(_sr_cast)
    acc = np.zeros(x.shape, np.float64)
    for i in range(n_keys):
        acc += np.float32(cast(x, jax.random.PRNGKey(i)))
    mean = acc / n_keys
    ulp = np.float32(2.0 ** -8)  # bf16 ulp in [1, 2)
    # per-element σ of the SR mean ≤ ulp/(2·sqrt(n)) ≈ 0.011 ulp at
    # n=2048; the max over 255 elements concentrates near 3.3σ ≈ 0.04
    # ulp, so 0.1 ulp only fails on a genuinely biased noise source
    assert np.max(np.abs(mean - np.float64(x))) < 0.1 * float(ulp)
    # ...and each single draw is one of the two bracketing bf16 values
    one = np.float32(_sr_cast(x, jax.random.PRNGKey(99)))
    lo = np.float32(x.astype(jnp.bfloat16))
    assert np.all((one == lo) | (np.abs(one - lo) <= float(ulp) * 2))


def test_sr_dense_forward_identical_to_fast_path():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (64, 32), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(k, 1), (32,), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(k, 2), (128, 64),
                          jnp.bfloat16)
    y_det = _dense_mixed(w, b, x, jnp.bfloat16)
    y_sr = _dense_mixed_sr(w, b, x, jax.random.PRNGKey(7), jnp.bfloat16)
    np.testing.assert_array_equal(np.float32(y_det), np.float32(y_sr))


def test_sr_grad_expectation_matches_f32_grads():
    """Key-averaged SR gradients converge to the f32-cotangent gradients;
    a single SR draw sits within bf16 noise of them."""
    k = jax.random.PRNGKey(3)
    w = jax.random.normal(k, (48, 24), jnp.float32) * 0.3
    b = jnp.zeros((24,), jnp.float32)
    x = (jax.random.normal(jax.random.fold_in(k, 1), (256, 48),
                           jnp.float32) * 0.5)
    g_out = jax.random.normal(jax.random.fold_in(k, 2), (256, 24),
                              jnp.float32)

    def loss_strict(w_):
        y = x @ w_ + b           # f32 end to end
        return jnp.vdot(y, g_out)

    def loss_sr(w_, key):
        y = _dense_mixed_sr(w_, b, x.astype(jnp.bfloat16), key,
                            jnp.bfloat16)
        return jnp.vdot(y, g_out)

    g_ref = jax.grad(loss_strict)(w)
    n_keys = 64
    acc = np.zeros(g_ref.shape, np.float64)
    g_sr = jax.jit(jax.grad(loss_sr))
    for i in range(n_keys):
        acc += np.float32(g_sr(w, jax.random.PRNGKey(100 + i)))
    mean = acc / n_keys
    scale = float(jnp.max(jnp.abs(g_ref)))
    # forward bf16 matmul alone bounds agreement at ~2^-8 relative; the
    # key-mean must land well inside a single draw's rounding band
    single = np.float32(g_sr(w, jax.random.PRNGKey(500)))
    err_single = np.max(np.abs(single - np.float32(g_ref))) / scale
    err_mean = np.max(np.abs(mean - np.float64(g_ref))) / scale
    assert err_mean < err_single
    assert err_mean < 2.5e-2, (err_mean, err_single)


def test_sr_grads_train_step_runs_and_is_finite():
    """cfg.sr_grads end to end through render_rays' gradient."""
    from helpers import build_tiny, synthetic_batch
    import dataclasses
    from anerf_tpu.render.raycaster import render_rays

    rng = np.random.default_rng(0)
    args, cfg, params, pose = build_tiny(rng, compute_dtype='bfloat16',
                                         sr_grads=True)
    batch = synthetic_batch(rng, pose)
    per_ray = {k: batch[k][batch['pose_idx']]
               for k in ('kp3d', 'skts', 'bones', 'cyls')}

    def loss(p, key):
        out = render_rays(p, cfg, batch['rays'], per_ray['kp3d'],
                          per_ray['skts'], per_ray['bones'],
                          per_ray['cyls'], cam_idxs=batch['cam_idxs'],
                          rng=key, tau=jnp.float32(150.0))
        return jnp.mean((out['rgb_map'] - batch['target_s']) ** 2)

    g1 = jax.grad(loss)(params, jax.random.PRNGKey(0))
    g2 = jax.grad(loss)(params, jax.random.PRNGKey(0))
    chex_all_finite = all(
        bool(jnp.isfinite(leaf).all()) for leaf in jax.tree.leaves(g1))
    assert chex_all_finite
    # same key -> identical grads (SR noise is keyed, not stateful)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
