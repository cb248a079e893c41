"""Fused encode+MLP kernel parity vs the XLA render path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anerf_tpu.kernels.fused_render import (build_raw_inputs,
                                            fused_encode_mlp,
                                            fused_render_supported,
                                            pack_render_params)
from anerf_tpu.models.nerf import lookup_framecodes
from anerf_tpu.render.raycaster import encode_inputs, run_network
from anerf_tpu.ops.encoding import transform_batch_pts, transform_batch_rays

from helpers import build_tiny, synthetic_batch


def flagship_tiny(rng):
    # flagship embedder family at reduced width for test speed
    return build_tiny(rng, netwidth=256, netdepth=8, multires=7,
                      multires_views=4, compute_dtype='bfloat16')


def test_supported_check(rng):
    args, cfg, params, pose = flagship_tiny(rng)
    assert fused_render_supported(cfg)
    import dataclasses
    bad = dataclasses.replace(cfg, kp_dist_type='relpos')
    assert not fused_render_supported(bad)


def test_fused_render_matches_xla(rng):
    args, cfg, params, pose = flagship_tiny(rng)
    batch = synthetic_batch(rng, pose, n_rays=16, n_images=4)
    pr = lambda k: batch[k][batch['pose_idx']]

    rays = batch['rays']
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    S = 6
    z = jnp.linspace(1.0, 3.0, S)
    pts = rays_o[:, None] + rays_d[:, None] * z[None, :, None]
    tau = jnp.float32(35.0)

    # XLA reference path
    enc = encode_inputs(cfg, pts, rays_d[:, None], pr('kp3d'), pr('skts'),
                        pr('bones'), params['cutoff_dist'], tau, None)
    fc = lookup_framecodes(params['coarse'], batch['cam_idxs'])
    want = run_network(cfg, params['coarse'], enc, fc)

    # fused kernel path
    x_raw = build_raw_inputs(pts, rays_d[:, None], pr('skts'), fc)
    packed = pack_render_params(params['coarse'], cfg.nerf,
                                cfg.embed_kp.num_freqs,
                                cfg.embed_view.num_freqs,
                                params['cutoff_dist'])
    R = x_raw.shape[0]
    got = fused_encode_mlp(cfg.nerf, packed, x_raw.reshape(R * S, -1),
                           256, tau)
    got = got.reshape(R, S, 4)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)
