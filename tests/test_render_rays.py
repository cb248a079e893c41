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


def test_mesh_density_no_viewdirs(rng):
    """Density grid query on a use_viewdirs=False model (output_linear
    head): the reference's query assumes alpha_linear and would crash
    (core/raycasters.py:643); ours reads output_linear's sigma channel."""
    from helpers import build_tiny

    args, cfg, params, pose = build_tiny(rng, use_viewdirs=False,
                                         cutoff_viewdir=False)
    assert 'alpha_linear' not in params['coarse']
    sigma = render_mesh_density(
        params, cfg, jnp.asarray(pose['kp3d'][:1]),
        jnp.asarray(pose['skts'][:1]), jnp.asarray(pose['bones'][:1]),
        radius=0.5, res=8)
    assert sigma.shape == (9, 9, 9)
    assert np.isfinite(np.asarray(sigma)).all()


def test_cull_samples_full_budget_is_identity(rng):
    """n_keep == n_samples must reproduce the un-culled render exactly."""
    import dataclasses
    from helpers import build_tiny, synthetic_batch
    from anerf_tpu.render.raycaster import render_rays

    args, cfg, params, pose = build_tiny(rng)
    batch = synthetic_batch(rng, pose)
    per_ray = {k: batch[k][batch['pose_idx']]
               for k in ('kp3d', 'skts', 'bones', 'cyls')}
    common = dict(cam_idxs=batch['cam_idxs'], rng=jax.random.PRNGKey(3),
                  tau=jnp.float32(150.0))

    base = render_rays(params, cfg, batch['rays'], per_ray['kp3d'],
                       per_ray['skts'], per_ray['bones'], per_ray['cyls'],
                       **common)
    cfg_full = dataclasses.replace(cfg, n_keep=cfg.n_samples)
    culled = render_rays(params, cfg_full, batch['rays'], per_ray['kp3d'],
                         per_ray['skts'], per_ray['bones'], per_ray['cyls'],
                         **common)
    for k in ('rgb_map', 'acc_map', 'rgb0'):
        np.testing.assert_allclose(np.asarray(culled[k]),
                                   np.asarray(base[k]), atol=1e-6, err_msg=k)


def test_cull_samples_direct_roundtrip(rng):
    """cull_samples itself with K == S must return (z, pts) unchanged.

    The render path guards culling behind `n_keep < n_samples`, so the
    full-budget identity test above never executes the selector; this
    exercises the keep-everything branch directly.
    """
    import dataclasses
    from anerf_tpu.render.raycaster import cull_samples

    args, cfg, params, pose = build_tiny(rng)
    R, S, J = 5, 16, pose['kp3d'].shape[1]
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    # strictly increasing z so the ascending-z restore is a unique order
    z = jnp.cumsum(jax.random.uniform(k1, (R, S)) + 0.01, axis=-1)
    pts = jax.random.normal(k2, (R, S, 3))
    kps = jnp.asarray(pose['kp3d'][:1].repeat(R, 0))
    cutoff = jnp.full((J,), 0.5)
    cfg_full = dataclasses.replace(cfg, n_keep=S)
    z_out, pts_out = cull_samples(cfg_full, z, pts, kps, cutoff)
    np.testing.assert_array_equal(np.asarray(z_out), np.asarray(z))
    np.testing.assert_array_equal(np.asarray(pts_out), np.asarray(pts))


def test_cull_samples_budget_shapes_and_quality(rng):
    """Reduced budget: static shapes hold, outputs finite, and in a scene
    where rays pass near the body the culled render stays close to the
    full one (dropped samples are outside every cutoff window)."""
    import dataclasses
    from helpers import build_tiny, synthetic_batch
    from anerf_tpu.render.raycaster import render_rays

    args, cfg, params, pose = build_tiny(rng)
    batch = synthetic_batch(rng, pose)
    per_ray = {k: batch[k][batch['pose_idx']]
               for k in ('kp3d', 'skts', 'bones', 'cyls')}
    common = dict(cam_idxs=batch['cam_idxs'], rng=jax.random.PRNGKey(3),
                  tau=jnp.float32(150.0))

    cfg_cull = dataclasses.replace(cfg, n_keep=cfg.n_samples // 2)
    out = render_rays(params, cfg_cull, batch['rays'], per_ray['kp3d'],
                      per_ray['skts'], per_ray['bones'], per_ray['cyls'],
                      **common)
    R = batch['rays'].shape[0]
    assert out['rgb_map'].shape == (R, 3)
    assert out['alpha'].shape == (R, cfg.n_samples // 2 + cfg.n_importance)
    assert np.isfinite(np.asarray(out['rgb_map'])).all()
    assert np.isfinite(np.asarray(out['disp_map'])).all()


def test_render_fn_cache_hit(rng):
    """make_render_fn must be cached on the (hashable) RenderConfig —
    a fresh jit wrapper per render_path call re-traces and re-compiles
    every path render (the round-1 '28-55k rays/s variance', PERF.md)."""
    import dataclasses
    from anerf_tpu.render.render_path import make_render_fn
    from helpers import build_tiny
    args, cfg, params, pose = build_tiny(rng)
    f1 = make_render_fn(cfg, False)
    f2 = make_render_fn(dataclasses.replace(cfg), False)  # equal config
    assert f1 is f2
    assert make_render_fn(cfg, True) is not f1


@pytest.mark.parametrize('knob', ['hifi_pe', 'remat_pe'])
def test_window_pe_render_forward_bit_identical(rng, knob):
    """cfg.hifi_pe / cfg.remat_pe change only the backward: the rendered
    forward under bf16 compute must be bit-identical to the default path."""
    import dataclasses
    args, cfg, params, pose = build_tiny(rng, compute_dtype='bfloat16')
    batch = synthetic_batch(rng, pose)
    per_ray = lambda k: batch[k][batch['pose_idx']]
    common = dict(cam_idxs=batch['cam_idxs'], rng=jax.random.PRNGKey(3),
                  tau=jnp.float32(150.0))
    base = render_rays(params, cfg, batch['rays'], per_ray('kp3d'),
                       per_ray('skts'), per_ray('bones'), per_ray('cyls'),
                       **common)
    alt = render_rays(params, dataclasses.replace(cfg, **{knob: True}),
                      batch['rays'], per_ray('kp3d'), per_ray('skts'),
                      per_ray('bones'), per_ray('cyls'), **common)
    for k in ('rgb_map', 'acc_map', 'rgb0'):
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(alt[k]), err_msg=k)


def test_remat_pe_render_grads_match_default(rng):
    """remat_pe keeps protocol-default backward numerics: full render_rays
    gradients match the plain-autodiff default to f32 reduction-order
    tolerance (vs ~1e-2-class drift for the bf16-backward knobs)."""
    import dataclasses
    args, cfg, params, pose = build_tiny(rng, compute_dtype='bfloat16')
    batch = synthetic_batch(rng, pose)
    per_ray = lambda k: batch[k][batch['pose_idx']]

    def loss(p, c):
        out = render_rays(p, c, batch['rays'], per_ray('kp3d'),
                          per_ray('skts'), per_ray('bones'),
                          per_ray('cyls'), cam_idxs=batch['cam_idxs'],
                          rng=jax.random.PRNGKey(3), tau=jnp.float32(150.0))
        return jnp.mean((out['rgb_map'] - 0.5) ** 2) + \
            jnp.mean((out['rgb0'] - 0.5) ** 2)

    v0, g0 = jax.value_and_grad(loss)(params, cfg)
    v1, g1 = jax.value_and_grad(loss)(
        params, dataclasses.replace(cfg, remat_pe=True))
    assert float(v0) == float(v1)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(a).max() + 1e-12
        assert float(np.abs(a - b).max() / scale) < 1e-4


def test_fast_knob_combos_finite_grads(rng):
    """The split fast-grads knobs (fast_pe / fast_mlp / alpha_f32 /
    hifi_pe) all produce finite losses and gradients."""
    import dataclasses
    args, cfg, params, pose = build_tiny(rng, compute_dtype='bfloat16')
    batch = synthetic_batch(rng, pose)
    per_ray = lambda k: batch[k][batch['pose_idx']]

    def loss(p, c):
        out = render_rays(p, c, batch['rays'], per_ray('kp3d'),
                          per_ray('skts'), per_ray('bones'),
                          per_ray('cyls'), cam_idxs=batch['cam_idxs'],
                          rng=jax.random.PRNGKey(3), tau=jnp.float32(150.0))
        return jnp.mean((out['rgb_map'] - 0.5) ** 2) + \
            jnp.mean((out['rgb0'] - 0.5) ** 2)

    combos = [dict(fast_pe=True, fast_mlp=False),
              dict(fast_pe=False, fast_mlp=True),
              dict(fast_mlp=True, alpha_f32=True),
              dict(hifi_pe=True, fast_mlp=True, alpha_f32=True)]
    for kw in combos:
        c = dataclasses.replace(cfg, **kw)
        val, g = jax.value_and_grad(loss)(params, c)
        assert np.isfinite(float(val)), kw
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves), kw
