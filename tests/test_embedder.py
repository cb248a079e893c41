"""Cutoff positional embedder vs a fresh numpy oracle of the reference
semantics (core/cutoff_embedder.py:111-197)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anerf_tpu.ops.embedder import (EmbedConfig, alpha_schedule, embed,
                                    make_embedder, tau_schedule)


def oracle_plain_pe(x, n_freqs, include_input=True):
    parts = [x] if include_input else []
    for k in range(n_freqs):
        f = 2.0 ** k
        parts.append(np.sin(x * f))
        parts.append(np.cos(x * f))
    return np.concatenate(parts, -1)


def oracle_cutoff(x, dists, cutoff, tau, n_freqs, cutoff_inputs,
                  dist_expand=1, sched_w=None):
    """Reimplementation of the cutoff PE math from first principles:
    per-channel window w = 1 - sigmoid(tau*(d - cutoff)); stack
    [sin f0, cos f0, sin f1, ...] blocks; optionally window raw input."""
    D = x.shape[-1]
    d_e = np.repeat(dists, dist_expand, -1)
    cut_e = np.repeat(cutoff, dist_expand, -1)
    w = 1.0 - 1.0 / (1.0 + np.exp(-(tau * (d_e - cut_e))))  # (..., D)
    rows = []
    for k in range(n_freqs):
        f = 2.0 ** k
        rows.append(np.sin(f * x))
        rows.append(np.cos(f * x))
    rows = np.stack(rows, -2) if rows else np.zeros(x.shape[:-1] + (0, D))
    if sched_w is not None:
        rows = rows * sched_w[:, None]
    if cutoff_inputs:
        rows = np.concatenate([x[..., None, :], rows], -2)
        rows = rows * w[..., None, :]
    else:
        rows = rows * w[..., None, :]
        rows = np.concatenate([x[..., None, :], rows], -2)
    return rows.reshape(*x.shape[:-1], -1), w


def test_plain_pe(rng):
    x = rng.normal(size=(5, 7, 72)).astype(np.float32)
    cfg, out_dim = make_embedder(4, 72)
    got, w = embed(cfg, jnp.asarray(x))
    assert w is None
    assert got.shape[-1] == out_dim == 72 * 9
    np.testing.assert_allclose(np.asarray(got), oracle_plain_pe(x, 4),
                               atol=1e-6)


@pytest.mark.parametrize('cutoff_inputs', [True, False])
def test_cutoff_reldist_mode(rng, cutoff_inputs):
    # dist_inputs=False: inputs are the 24 per-joint distances
    x = np.abs(rng.normal(size=(6, 3, 24))).astype(np.float32)
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    tau = 37.0
    cfg = EmbedConfig(input_dims=24, num_freqs=7, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=cutoff_inputs, dist_inputs=False)
    got, w = embed(cfg, jnp.asarray(x), dists=jnp.asarray(x),
                   cutoff_dist=jnp.asarray(cutoff), tau=jnp.float32(tau))
    want, w_want = oracle_cutoff(x, x, cutoff, tau, 7, cutoff_inputs)
    assert got.shape[-1] == cfg.out_dim == 24 * 15
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w)[..., 0, :], w_want, atol=1e-6)


def test_cutoff_dist_inputs_mode(rng):
    # dist_inputs=True: e.g. view encoding (72) with 24 joint dists
    x = rng.normal(size=(4, 5, 72)).astype(np.float32)
    dists = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32)
    cutoff = rng.uniform(0.2, 0.8, size=(24,)).astype(np.float32)
    tau = 20.0
    cfg = EmbedConfig(input_dims=72, num_freqs=4, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=True, dist_inputs=True)
    got, _ = embed(cfg, jnp.asarray(x), dists=jnp.asarray(dists),
                   cutoff_dist=jnp.asarray(cutoff), tau=jnp.float32(tau))
    want, _ = oracle_cutoff(x, dists, cutoff, tau, 4, True, dist_expand=3)
    assert got.shape[-1] == cfg.out_dim == 72 * 9
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_cutoff_broadcast_view_inputs(rng):
    """View inputs at (R, 1, D) with per-sample dists (R, S, J) must equal
    the fully-expanded computation."""
    R, S = 3, 6
    x1 = rng.normal(size=(R, 1, 72)).astype(np.float32)
    dists = np.abs(rng.normal(size=(R, S, 24))).astype(np.float32)
    cutoff = np.full((24,), 0.6, dtype=np.float32)
    cfg = EmbedConfig(input_dims=72, num_freqs=4, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=True, dist_inputs=True)
    got, _ = embed(cfg, jnp.asarray(x1), dists=jnp.asarray(dists),
                   cutoff_dist=jnp.asarray(cutoff), tau=jnp.float32(25.0))
    x_full = np.broadcast_to(x1, (R, S, 72))
    want, _ = oracle_cutoff(x_full, dists, cutoff, 25.0, 4, True,
                            dist_expand=3)
    assert got.shape == (R, S, cfg.out_dim)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_tau_schedule():
    cfg = EmbedConfig(input_dims=24, num_freqs=7, cutoff=True)
    # reference: tau = 20 * rate^(step/(cutoff_step*1000)), clamp 2000
    t0 = float(tau_schedule(cfg, 0, 250, 10.0))
    t1 = float(tau_schedule(cfg, 250000, 250, 10.0))
    t2 = float(tau_schedule(cfg, 10**9, 250, 10.0))
    assert np.isclose(t0, 20.0)
    assert np.isclose(t1, 200.0)
    assert t2 == 2000.0


def test_freq_schedule(rng):
    x = np.abs(rng.normal(size=(2, 3, 24))).astype(np.float32)
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    cfg = EmbedConfig(input_dims=24, num_freqs=4, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=False, dist_inputs=False,
                      freq_schedule=True, init_alpha=0.0)
    alpha = alpha_schedule(cfg, 2500, 5)  # halfway to target 3
    assert np.isclose(float(alpha), 1.5)
    got, _ = embed(cfg, jnp.asarray(x), dists=jnp.asarray(x),
                   cutoff_dist=jnp.asarray(cutoff), tau=jnp.float32(30.0),
                   alpha=alpha)
    # oracle schedule weight per (freq, fn) row
    freq_k = np.log2(2.0 ** np.arange(4))[:, None].repeat(2, 1)
    diff = np.clip(1.5 - freq_k, 0, 1)
    sched = (0.5 * (1 - np.cos(np.pi * diff))).reshape(-1)
    want, _ = oracle_cutoff(x, x, cutoff, 30.0, 4, False, sched_w=sched)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_shift_inputs_keeps_raw_block(rng):
    """shift_inputs shifts only the frequency inputs; the raw include block
    stays unshifted."""
    x = np.abs(rng.normal(size=(2, 3, 24))).astype(np.float32)
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    cfg = EmbedConfig(input_dims=24, num_freqs=2, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=False, dist_inputs=False,
                      shift_inputs=True)
    got, _ = embed(cfg, jnp.asarray(x), dists=jnp.asarray(x),
                   cutoff_dist=jnp.asarray(cutoff), tau=jnp.float32(15.0))
    got = np.asarray(got).reshape(2, 3, 5, 24)
    np.testing.assert_allclose(got[..., 0, :], x, atol=1e-6)  # raw block
    shifted = x * (2.0 / 0.5) - 1.0
    w = 1.0 - 1.0 / (1.0 + np.exp(-(15.0 * (x - 0.5))))
    np.testing.assert_allclose(got[..., 1, :], np.sin(shifted) * w, atol=1e-5)


def test_bf16_out_dtype_values_and_grads(rng):
    """out_dtype=bfloat16 emits the same encoding (to bf16 tolerance) and
    its custom low-precision backward matches the f32 gradients."""
    x = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    d = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    cfg = EmbedConfig(input_dims=24, num_freqs=5, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=True, dist_inputs=False)

    def f(xx, dd, dtype):
        e, _ = embed(cfg, xx, dists=dd, cutoff_dist=jnp.asarray(cutoff),
                     tau=jnp.float32(20.0), out_dtype=dtype)
        # weighted sum so every channel contributes a distinct gradient
        wsum = jnp.arange(e.size, dtype=jnp.float32).reshape(e.shape) / e.size
        return jnp.sum(e.astype(jnp.float32) * wsum)

    v32, g32 = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(d), None)
    v16, g16 = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(d), jnp.bfloat16)
    assert np.isclose(float(v32), float(v16), rtol=2e-2)
    for a, b in zip(g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 backward: errors must be small relative to the gradient
        # SCALE (near-zero entries see pure rounding noise)
        floor = 0.1 * np.abs(a).mean() + 1e-6
        rel = np.abs(a - b) / np.maximum(np.abs(a), floor)
        assert float(rel.mean()) < 0.01, float(rel.mean())
        assert float(rel.max()) < 0.2, float(rel.max())


@pytest.mark.parametrize('mode', ['hifi', 'remat'])
@pytest.mark.parametrize('cutoff_inputs', [True, False])
def test_window_pe_forward_bit_identical(rng, cutoff_inputs, mode):
    """hifi_dtype / remat_dtype: the forward must be BIT-identical to the
    default f32 chain followed by a single cast — across both include
    orderings and the broadcast view layout."""
    sel = {('hifi_dtype' if mode == 'hifi' else 'remat_dtype'): jnp.bfloat16}
    # kp-style: inputs are the dists (R, S, 24)
    x = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    cfg = EmbedConfig(input_dims=24, num_freqs=5, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=cutoff_inputs, dist_inputs=False)
    kw = dict(dists=jnp.asarray(x), cutoff_dist=jnp.asarray(cutoff),
              tau=jnp.float32(20.0))
    ref, _ = embed(cfg, jnp.asarray(x), **kw)
    got, _ = embed(cfg, jnp.asarray(x), **kw, **sel)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(ref.astype(jnp.bfloat16), dtype=np.float32),
        np.asarray(got, dtype=np.float32))

    # view-style: inputs (R, 1, 72) broadcast against dists (R, S, 24)
    xv = rng.normal(size=(4, 1, 72)).astype(np.float32)
    dv = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    cfgv = EmbedConfig(input_dims=72, num_freqs=3, cutoff=True,
                       cutoff_dim=24, cutoff_inputs=cutoff_inputs,
                       dist_inputs=True)
    kwv = dict(dists=jnp.asarray(dv), cutoff_dist=jnp.asarray(cutoff),
               tau=jnp.float32(20.0))
    refv, _ = embed(cfgv, jnp.asarray(xv), **kwv)
    gotv, _ = embed(cfgv, jnp.asarray(xv), **kwv, **sel)
    assert gotv.shape == refv.shape
    np.testing.assert_array_equal(
        np.asarray(refv.astype(jnp.bfloat16), dtype=np.float32),
        np.asarray(gotv, dtype=np.float32))


@pytest.mark.parametrize('cutoff_inputs', [True, False])
def test_remat_pe_backward_f32_value_parity(rng, cutoff_inputs):
    """remat_dtype backward: SAME f32 gradient values as plain autodiff of
    the default chain + cast (only the reduction order differs, ~1 ulp) —
    this is what lets remat_pe ship inside the protocol-default config."""
    x = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    d = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    cfg = EmbedConfig(input_dims=24, num_freqs=5, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=cutoff_inputs, dist_inputs=False)

    def f(xx, dd, remat):
        e, _ = embed(cfg, xx, dists=dd, cutoff_dist=jnp.asarray(cutoff),
                     tau=jnp.float32(20.0),
                     remat_dtype=jnp.bfloat16 if remat else None)
        # the default path emits f32; round it once like the raycaster
        # does so both branches see the SAME bf16 output and cotangents
        e = e.astype(jnp.bfloat16).astype(jnp.float32)
        wsum = jnp.arange(e.size, dtype=jnp.float32).reshape(e.shape) / e.size
        return jnp.sum(e * wsum)

    v32, g32 = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(d), False)
    vrm, grm = jax.value_and_grad(f, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(d), True)
    assert float(v32) == float(vrm)          # forward bit-identical
    for a, b in zip(g32, grm):
        a, b = np.asarray(a), np.asarray(b)
        floor = 1e-3 * np.abs(a).mean() + 1e-12
        rel = np.abs(a - b) / np.maximum(np.abs(a), floor)
        assert float(rel.max()) < 1e-4, float(rel.max())


@pytest.mark.parametrize('cutoff_inputs', [True, False])
def test_hifi_pe_backward_close_to_f32(rng, cutoff_inputs):
    """hifi backward (bf16 wide math) tracks the f32 gradients for both
    the frequency inputs and the window (dists) path."""
    x = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    d = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    cfg = EmbedConfig(input_dims=24, num_freqs=5, cutoff=True, cutoff_dim=24,
                      cutoff_inputs=cutoff_inputs, dist_inputs=False)

    def f(xx, dd, hifi):
        e, _ = embed(cfg, xx, dists=dd, cutoff_dist=jnp.asarray(cutoff),
                     tau=jnp.float32(20.0),
                     hifi_dtype=jnp.bfloat16 if hifi else None)
        wsum = jnp.arange(e.size, dtype=jnp.float32).reshape(e.shape) / e.size
        return jnp.sum(e.astype(jnp.float32) * wsum)

    g32 = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(d), False)
    g16 = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(d), True)
    for a, b in zip(g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        floor = 0.1 * np.abs(a).mean() + 1e-6
        rel = np.abs(a - b) / np.maximum(np.abs(a), floor)
        assert float(rel.mean()) < 0.01, float(rel.mean())
        assert float(rel.max()) < 0.2, float(rel.max())


def test_hifi_pe_view_broadcast_grads(rng):
    """Broadcast view layout: gradient shapes reduce correctly over the
    sample axis and stay finite/close to f32."""
    xv = rng.normal(size=(4, 1, 72)).astype(np.float32)
    dv = np.abs(rng.normal(size=(4, 5, 24))).astype(np.float32) * 0.4
    cutoff = np.full((24,), 0.5, dtype=np.float32)
    cfgv = EmbedConfig(input_dims=72, num_freqs=3, cutoff=True,
                       cutoff_dim=24, cutoff_inputs=True, dist_inputs=True)

    def f(xx, dd, hifi):
        e, _ = embed(cfgv, xx, dists=dd, cutoff_dist=jnp.asarray(cutoff),
                     tau=jnp.float32(20.0),
                     hifi_dtype=jnp.bfloat16 if hifi else None)
        wsum = jnp.arange(e.size, dtype=jnp.float32).reshape(e.shape) / e.size
        return jnp.sum(e.astype(jnp.float32) * wsum)

    g32 = jax.grad(f, argnums=(0, 1))(jnp.asarray(xv), jnp.asarray(dv), False)
    g16 = jax.grad(f, argnums=(0, 1))(jnp.asarray(xv), jnp.asarray(dv), True)
    assert g16[0].shape == xv.shape and g16[1].shape == dv.shape
    for a, b in zip(g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        floor = 0.1 * np.abs(a).mean() + 1e-6
        rel = np.abs(a - b) / np.maximum(np.abs(a), floor)
        assert float(rel.mean()) < 0.02, float(rel.mean())
