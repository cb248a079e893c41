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


class _FakeRef:
    """Array-as-ref shim: lets the kernel tile functions run as plain jnp
    (the pure-jnp oracle that tests autodiff against the hand-written
    backward kernel)."""

    def __init__(self, arr):
        self.arr = jnp.asarray(arr)

    def __getitem__(self, idx):
        return self.arr[idx]


def _fused_setup(rng, n_rays=16, S=6):
    from anerf_tpu.kernels.fused_render import (pack_ray_data,
                                                pack_render_params)
    args, cfg, params, pose = flagship_tiny(rng)
    batch = synthetic_batch(rng, pose, n_rays=n_rays, n_images=4)
    pr = lambda k: batch[k][batch['pose_idx']]
    rays = batch['rays']
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    z = jnp.linspace(1.0, 3.0, S)
    pts = rays_o[:, None] + rays_d[:, None] * z[None, :, None]
    fc = lookup_framecodes(params['coarse'], batch['cam_idxs'])
    packed = pack_render_params(params['coarse'], cfg.nerf,
                                cfg.embed_kp.num_freqs,
                                cfg.embed_view.num_freqs,
                                params['cutoff_dist'])
    m_all, aux = pack_ray_data(rays_d[:, None], pr('skts'), fc)
    return cfg, params, batch, pts, rays_d, packed, m_all, aux, pr


def test_fused_pts_kernel_matches_xla(rng):
    """v3 (pts-native) kernel forward vs the XLA encode+MLP path."""
    from anerf_tpu.kernels.fused_render import fused_encode_mlp_pts
    cfg, params, batch, pts, rays_d, packed, m_all, aux, pr = _fused_setup(
        rng)
    tau = jnp.float32(35.0)
    S = pts.shape[1]
    enc = encode_inputs(cfg, pts, rays_d[:, None], pr('kp3d'), pr('skts'),
                        pr('bones'), params['cutoff_dist'], tau, None)
    fc = lookup_framecodes(params['coarse'], batch['cam_idxs'])
    want = run_network(cfg, params['coarse'], enc, fc)
    got = fused_encode_mlp_pts(cfg.nerf, packed, pts, m_all, aux, S, tau)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize('bwd_f32', [False, True])
def test_fused_apply_vjp_matches_oracle(rng, bwd_f32):
    """The hand-written backward kernel vs jax.grad through a pure-jnp
    replica of the SAME tile math. Weight/input grads must agree to
    cotangent-rounding tolerance (the oracle's autodiff rounds cotangents
    to bf16 at every cast site; the bf16 kernel flavor rounds at matmul
    inputs, the f32 flavor never rounds them)."""
    import anerf_tpu.kernels.fused_render as fr
    cfg, params, batch, pts, rays_d, packed, m_all, aux, pr = _fused_setup(
        rng)
    R, S = pts.shape[:2]
    tau = jnp.float32(35.0)
    gw = jnp.asarray(
        np.random.default_rng(7).normal(size=(R, S, 4)).astype(np.float32))

    def oracle(packed_in, pts_in, m_in, aux_in):
        w = {n: packed_in[n] for n in fr._names(cfg.nerf)}
        t = fr._transform_tile(S, R, _FakeRef(pts_in.reshape(R * S, 3)),
                               _FakeRef(m_in), _FakeRef(aux_in))
        out, _ = fr._forward_trace(cfg.nerf, w, t['v'], t['r'], t['d'],
                                   t['fc'], tau)
        return jnp.sum(out.reshape(R, S, fr.LANE)[:, :, :4] * gw)

    def fused(packed_in, pts_in, m_in, aux_in):
        out = fr.fused_apply(cfg.nerf, S, bwd_f32, packed_in, pts_in,
                             m_in, aux_in, tau)
        return jnp.sum(out * gw)

    lo, go = jax.value_and_grad(oracle, argnums=(0, 1, 2, 3))(
        packed, pts, m_all, aux)
    lf, gf = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(
        packed, pts, m_all, aux)
    assert abs(lo - lf) / abs(lo) < 1e-3

    def relmax(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)

    for n in fr._trainable_names(cfg.nerf):
        assert relmax(go[0][n], gf[0][n]) < 0.02, n
    assert relmax(go[1], gf[1]) < 0.02      # d_pts
    assert relmax(go[2], gf[2]) < 0.02      # d_m_all (pose path)
    assert relmax(go[3], gf[3]) < 0.02      # d_aux (pose/view/framecode)
    # cutoff_dist and tau get zero grads by design (never trained)
    for n in fr.CONST_NAMES:
        assert not np.any(np.asarray(gf[0][n]))


def test_render_rays_fused_matches_xla(rng):
    """End-to-end render_rays with use_fused vs the XLA path."""
    import dataclasses
    from anerf_tpu.render.raycaster import render_rays
    args, cfg, params, pose = flagship_tiny(rng)
    cfg_f = dataclasses.replace(cfg, use_fused=True)
    batch = synthetic_batch(rng, pose, n_rays=16, n_images=4)
    pr = lambda k: batch[k][batch['pose_idx']]
    key = jax.random.PRNGKey(3)
    kwargs = dict(ray_batch=batch['rays'], kp_batch=pr('kp3d'),
                  skts=pr('skts'), bones=pr('bones'), cyls=pr('cyls'),
                  cam_idxs=batch['cam_idxs'], rng=key,
                  tau=jnp.float32(35.0))
    want = render_rays(params, cfg, **kwargs)
    got = render_rays(params, cfg_f, **kwargs)
    np.testing.assert_allclose(np.asarray(got['rgb_map']),
                               np.asarray(want['rgb_map']),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(got['acc_map']),
                               np.asarray(want['acc_map']),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize('mv', [4, 0])
def test_render_rays_fused_single_net_matches_xla(rng, mv):
    """single_net fine merge through the FUSED path: only the new
    importance samples run the kernel (raycaster.py:392-394 — the
    reference's single-net compute saving, core/raycasters.py:796-812,
    preserved inside the fused kernel, VERDICT r4 #3). mv=0 is the
    reference's own surreal_single.txt setting (multires_views 0): zero
    view bands must pack to a LANE-padded zero block, not an empty
    concat (round-5 fix)."""
    import dataclasses
    from anerf_tpu.render.raycaster import render_rays
    args, cfg, params, pose = build_tiny(
        rng, netwidth=256, netdepth=8, multires=7, multires_views=mv,
        compute_dtype='bfloat16', single_net=True)
    assert params['fine'] is None
    cfg_f = dataclasses.replace(cfg, use_fused=True)
    batch = synthetic_batch(rng, pose, n_rays=16, n_images=4)
    pr = lambda k: batch[k][batch['pose_idx']]
    key = jax.random.PRNGKey(3)
    kwargs = dict(ray_batch=batch['rays'], kp_batch=pr('kp3d'),
                  skts=pr('skts'), bones=pr('bones'), cyls=pr('cyls'),
                  cam_idxs=batch['cam_idxs'], rng=key,
                  tau=jnp.float32(35.0))
    want = render_rays(params, cfg, **kwargs)
    got = render_rays(params, cfg_f, **kwargs)
    np.testing.assert_allclose(np.asarray(got['rgb_map']),
                               np.asarray(want['rgb_map']),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(got['acc_map']),
                               np.asarray(want['acc_map']),
                               atol=3e-2, rtol=3e-2)


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


def test_render_rays_fused_f32_grads_match_xla_default(rng):
    """Fused path at default numerics (fast_grads off -> f32 cotangent
    matmuls in the backward kernel) vs the XLA default path: gradients
    w.r.t. the MLP params and the skeleton transforms must agree to the
    bf16-forward tolerance. This is the value-preserving flavor that
    makes --fused_kernel a protocol-default-numerics candidate."""
    import dataclasses
    from anerf_tpu.render.raycaster import render_rays
    args, cfg, params, pose = flagship_tiny(rng)
    assert not cfg.fast_grads and cfg.use_fused is False
    cfg_f = dataclasses.replace(cfg, use_fused=True)
    batch = synthetic_batch(rng, pose, n_rays=16, n_images=4)
    pr = lambda k: batch[k][batch['pose_idx']]
    key = jax.random.PRNGKey(3)
    target = jax.random.uniform(jax.random.PRNGKey(5), (16, 3))

    def loss(c, p, skts):
        out = render_rays(p, c, batch['rays'], pr('kp3d'), skts,
                          pr('bones'), pr('cyls'),
                          cam_idxs=batch['cam_idxs'], rng=key,
                          tau=jnp.float32(35.0))
        return jnp.mean((out['rgb_map'] - target) ** 2)

    g_xla = jax.grad(loss, argnums=(1, 2))(cfg, params, pr('skts'))
    g_fus = jax.grad(loss, argnums=(1, 2))(cfg_f, params, pr('skts'))

    def relmax(a, b):
        # bf16-forward tolerance: tiny-magnitude leaves (the fine net's
        # barely-hit layers, grads ~1e-8) are noise-dominated, so floor
        # the denominator well above the f32 noise floor
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.abs(a).max(), 1e-7)
        return np.abs(a - b).max() / denom

    leaves_x, tree = jax.tree_util.tree_flatten_with_path(g_xla[0])
    leaves_f = jax.tree_util.tree_leaves(g_fus[0])
    for (path, lx), lf in zip(leaves_x, leaves_f):
        name = jax.tree_util.keystr(path)
        if 'cutoff_dist' in name:
            # zero by design in the fused VJP (never trained; the XLA
            # path differentiates it incidentally)
            assert not np.any(np.asarray(lf))
            continue
        assert relmax(lx, lf) < 0.12, (name, relmax(lx, lf))
    assert relmax(g_xla[1], g_fus[1]) < 0.12   # pose path (skts)


def test_fast_sincos_accuracy_and_grad():
    """_fast_sincos (the fused kernel's PE trig) vs libm over the full
    band-angle range (|2^k * v| up to ~500 rad at multires=7 and worst
    realistic distances): 1e-5 abs — three orders below the bf16 cast
    (4e-3) the bands land in. Autodiff must give the matching
    derivative pair a.e. (the pure-jnp replica is jax.grad'd)."""
    from anerf_tpu.kernels.fused_render import _fast_sincos

    rng = np.random.default_rng(3)
    x = jnp.asarray(np.concatenate([
        rng.uniform(-500, 500, 100000),
        rng.uniform(-3.2, 3.2, 50000),          # dense near the origin
        np.array([0.0, np.pi / 2, np.pi, -np.pi, 2 ** 6 * 2.0]),
    ]).astype(np.float32))
    s, c = _fast_sincos(x)
    x64 = np.asarray(x, np.float64)
    # 4e-5 bound: the polynomial itself is 3e-6; the rest is f32 input
    # quantization at 500 rad (eps ~ 3e-5 rad), which libm on the same
    # f32 input suffers identically
    assert np.abs(np.asarray(s) - np.sin(x64)).max() < 4e-5
    assert np.abs(np.asarray(c) - np.cos(x64)).max() < 4e-5

    g = jax.vmap(jax.grad(lambda t: _fast_sincos(t)[0]))(x[:2000])
    assert np.abs(np.asarray(g) - np.cos(x64[:2000])).max() < 1e-4
    g2 = jax.vmap(jax.grad(lambda t: _fast_sincos(t)[1]))(x[:2000])
    assert np.abs(np.asarray(g2) + np.sin(x64[:2000])).max() < 1e-4
