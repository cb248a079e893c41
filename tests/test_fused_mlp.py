"""Pallas fused MLP kernel parity vs the reference jnp apply."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anerf_tpu.kernels.fused_mlp import (fused_mlp_apply, pack_params,
                                         supports_config)
from anerf_tpu.models.nerf import NeRFConfig, apply_nerf, init_nerf_params


@pytest.mark.parametrize('use_framecode', [False, True])
def test_fused_mlp_matches_reference(rng, use_framecode):
    cfg = NeRFConfig(depth=8, width=256, input_ch=360, input_ch_bones=72,
                     input_ch_views=648, skips=(4,), use_viewdirs=True,
                     use_framecode=use_framecode, framecode_ch=16,
                     n_framecodes=4)
    assert supports_config(cfg)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)

    P = 1500  # deliberately not a tile multiple
    x_pts = rng.normal(size=(P, cfg.dnet_input)).astype(np.float32)
    view_in = cfg.input_ch_views + (cfg.framecode_ch if use_framecode else 0)
    x_view = rng.normal(size=(P, view_in)).astype(np.float32)

    # reference path in bf16 (same compute dtype as the kernel)
    if use_framecode:
        fc = x_view[:, cfg.input_ch_views:]
        want = apply_nerf(params, cfg, jnp.asarray(x_pts),
                          jnp.asarray(x_view[:, :cfg.input_ch_views]),
                          jnp.asarray(fc), compute_dtype=jnp.bfloat16)
    else:
        want = apply_nerf(params, cfg, jnp.asarray(x_pts),
                          jnp.asarray(x_view), compute_dtype=jnp.bfloat16)

    packed = pack_params(params, cfg)
    got = fused_mlp_apply(cfg, packed, jnp.asarray(x_pts),
                          jnp.asarray(x_view), 512)

    assert got.shape == (P, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_fused_mlp_small_width():
    cfg = NeRFConfig(depth=4, width=256, input_ch=24, input_ch_bones=0,
                     input_ch_views=72, skips=(2,), use_viewdirs=True)
    params = init_nerf_params(jax.random.PRNGKey(1), cfg)
    packed = pack_params(params, cfg)
    x_pts = jnp.ones((100, 24))
    x_view = jnp.ones((100, 72))
    out = fused_mlp_apply(cfg, packed, x_pts, x_view, 256)
    want = apply_nerf(params, cfg, x_pts, x_view, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-2,
                               rtol=2e-2)
