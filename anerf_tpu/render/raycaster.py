"""The rendering core: cylinder bounds -> sampling -> skeleton-relative
encoding -> MLP -> compositing -> importance resampling -> fine pass.

TPU re-design of reference core/raycasters.py:326-822. Differences by design:
  * One pure function `render_rays(params, cfg, batch, rng, train)` traced
    once under jit with static shapes — no chunk loops, no nn.DataParallel
    (the reference's `chunk`/`netchunk` exist only to fit GPU memory).
  * Framecodes are gathered per-ray once and broadcast over samples instead
    of being concatenated per-point and split inside the MLP.
  * View encodings are computed at (R, 1, .) and only the per-sample cutoff
    window runs at (R, S, .).
  * Coarse/fine merge is jnp.sort + take_along_axis (gradient-preserving).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.nerf import (NeRFConfig, apply_nerf, forward_density, _dense,
                           lookup_framecodes)
from ..ops.compositing import get_density_fn, raw2outputs
from ..ops.cylinder import get_near_far_in_cylinder
from ..ops.embedder import EmbedConfig, embed
from ..ops.gather import scatter_rows, take_rows
from ..ops.encoding import (make_bone_encoder, make_kp_encoder,
                            make_view_encoder, transform_batch_pts,
                            transform_batch_rays)
from ..ops.sampling import isample_from_lineseg, sample_from_lineseg
from ..skeleton import Skeleton, SMPLSkeleton


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static configuration of the full render path.

    Mirrors the knobs carried by render_kwargs_train/test + preproc_kwargs
    in the reference (core/raycasters.py:145-177).
    """
    nerf: NeRFConfig
    embed_kp: EmbedConfig
    embed_bone: Optional[EmbedConfig]
    embed_view: Optional[EmbedConfig]
    skel: Skeleton = SMPLSkeleton
    kp_dist_type: str = 'reldist'
    bone_type: str = 'reldir'
    view_type: str = 'relray'
    n_samples: int = 64
    n_importance: int = 16
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    ray_noise_std: float = 0.0
    lindisp: bool = False
    single_net: bool = False
    use_viewdirs: bool = True
    density_type: str = 'relu'
    softplus_shift: float = 1.0
    density_scale: float = 1.0
    rgb_eps: float = 0.001
    compute_dtype: str = 'bfloat16'   # 'bfloat16' | 'float32'
    # opt-in low-precision backward + PE emission: ~18% faster train step,
    # measured ~2 dB background-PSNR cost on the synthetic recipe (PERF.md)
    fast_grads: bool = False
    # fine-grained overrides (None = follow fast_grads); see config.py
    fast_pe: Optional[bool] = None
    fast_mlp: Optional[bool] = None
    alpha_f32: bool = False       # f32 cotangents on the alpha head
    # stochastically-rounded bf16 MLP activation cotangents (--sr_grads):
    # fast_mlp speed with UNBIASED rounding at both bf16-producing
    # backward sites, targeting the systematic round-to-nearest bias
    # behind fast_grads' ~2 dB background loss (PERF.md). Experimental:
    # forward math identical to fast_mlp; PE backward stays at whatever
    # the PE knobs select. Needs an rng at train time (eval is
    # backward-free, so the deterministic path serves it).
    sr_grads: bool = False
    hifi_pe: bool = False         # f32-forward / bf16-backward PE
    # f32-forward / f32-backward PE with rematerialized residuals: same
    # gradient VALUES as the plain-autodiff default (f32 math throughout;
    # sin/cos recomputed in the backward instead of stored), so it is
    # protocol-default numerics at lower HBM traffic. Ignored when
    # fast_pe / hifi_pe select a low-precision PE backward.
    remat_pe: bool = False
    # opt-in sample culling (--cull_ratio): keep only the n_keep samples
    # per ray closest to the body (inside the cutoff windows, ordered by
    # z), drop the rest before encode/MLP. The cutoff window already
    # drives their encodings to zero; culling skips their compute
    # entirely. 0 = off. cull_margin widens the keep region relative to
    # the cutoff radius so softly-windowed samples near the boundary
    # still render/train.
    n_keep: int = 0
    cull_margin: float = 0.1
    # opt-in fused Pallas path (--fused_kernel): world->local transform +
    # cutoff-PE + MLP in one VMEM-resident kernel with a custom-VJP
    # backward (kernels/fused_render.py). Requires the standard encoder
    # family (fused_render_supported) and bfloat16 compute.
    use_fused: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == 'bfloat16' else None

    @property
    def eff_fast_pe(self) -> bool:
        return self.fast_grads if self.fast_pe is None else self.fast_pe

    @property
    def eff_fast_mlp(self) -> bool:
        return self.fast_grads if self.fast_mlp is None else self.fast_mlp

    def test_mode(self) -> 'RenderConfig':
        """Copy with stochasticity disabled (reference raycasters.py:170-178)."""
        return dataclasses.replace(self, perturb=0.0, raw_noise_std=0.0,
                                   ray_noise_std=0.0)


def encode_inputs(cfg: RenderConfig,
                  pts: jnp.ndarray,
                  rays_d: jnp.ndarray,
                  kps: jnp.ndarray,
                  skts: jnp.ndarray,
                  bones: Optional[jnp.ndarray],
                  cutoff_dist: jnp.ndarray,
                  tau: jnp.ndarray,
                  alpha_sched: Optional[jnp.ndarray],
                  ) -> Dict[str, jnp.ndarray]:
    """Skeleton-relative encoding of query points (raycasters.py:476-555).

    pts (R, S, 3), rays_d (R, 1, 3), kps (R, J, 3), skts (R, J, 4, 4).
    Returns {'v','r','d'} embedded features.
    """
    kp_spec, _, _ = make_kp_encoder(cfg.kp_dist_type, cfg.skel)
    bone_spec, bone_dims = make_bone_encoder(cfg.bone_type, cfg.skel)
    view_spec, _ = make_view_encoder(cfg.view_type, cfg.skel)

    flat_fast = (cfg.kp_dist_type == 'reldist'
                 and cfg.bone_type in ('reldir', 'Nope')
                 and cfg.view_type == 'relray')
    if flat_fast:
        # lane-parallel layout: all per-joint 3-vector math stays flat
        # (R, S, J*3) — the (R, S, J, 3) layout puts the 3-vector on the
        # 128-lane axis at 3/128 utilization (see
        # ops/encoding.py:transform_batch_pts_flat)
        from ..ops.encoding import (_expand3, _group3_sumsq,
                                    transform_batch_pts_flat)
        J = cfg.skel.n_joints
        pts_tf = transform_batch_pts_flat(pts, skts)        # (R, S, J*3)
        v = jnp.sqrt(jnp.maximum(_group3_sumsq(pts_tf, J), 0.0))
        r = None
        if bone_dims > 0:
            r = pts_tf * _expand3(1.0 / jnp.maximum(v, 1e-12), J)
        R_ = skts.shape[0]
        rot_cols = skts[..., :3, :3].transpose(0, 3, 1, 2).reshape(
            R_, 3, J * 3)
        rays_f = jnp.einsum('rsb,rbc->rsc', rays_d, rot_cols,
                            precision='highest')  # (R, 1, J*3)
        dss = _group3_sumsq(rays_f, J)
        d = rays_f * _expand3(jax.lax.rsqrt(jnp.maximum(dss, 1e-24)), J)
        j_dists = v
    else:
        pts_t = transform_batch_pts(pts, skts)          # (R, S, J, 3)
        rays_t = transform_batch_rays(rays_d, skts)     # (R, 1, J, 3)

        v = kp_spec(pts, pts_t, kps)
        r = bone_spec(pts_t, bones=bones, refs=pts) if bone_dims > 0 else None
        d = view_spec(rays_t, pts_t=pts_t,
                      refs=None if cfg.view_type == 'relray' else pts)

        # per-joint distances for the cutoff windows (raycasters.py:530-534)
        if 'Dist' in kp_spec.name:
            j_dists = v
        else:
            j_dists = jnp.linalg.norm(pts[:, :, None] - kps[:, None],
                                      axis=-1)

    # Emitting the (wide) encodings directly in the MLP compute dtype fuses
    # the cast into the PE elementwise chain and halves the HBM traffic of
    # the encode->MLP boundary (the 360/648-wide tensors).
    enc_dtype = cfg.dtype or jnp.float32
    # low-precision PE emission/backward only on the opt-in fast path: the
    # double rounding measurably costs background PSNR (PERF.md). hifi_pe
    # keeps the forward bits identical to the default (single rounding)
    # and lowers only the backward to bf16.
    _pe_dtype = cfg.dtype if cfg.eff_fast_pe else None
    _hifi = cfg.hifi_pe and cfg.dtype is not None
    _remat = (cfg.remat_pe and cfg.dtype is not None
              and _pe_dtype is None and not _hifi)
    pe_kw = dict(tau=tau, alpha=alpha_sched, out_dtype=_pe_dtype,
                 hifi_dtype=cfg.dtype if _hifi else None,
                 remat_dtype=cfg.dtype if _remat else None)

    v_e, _ = embed(cfg.embed_kp, v, dists=j_dists, cutoff_dist=cutoff_dist,
                   **pe_kw)
    v_e = v_e.astype(enc_dtype)
    r_e = None
    if r is not None and cfg.embed_bone is not None:
        r_e, _ = embed(cfg.embed_bone, r, dists=j_dists,
                       cutoff_dist=cutoff_dist, **pe_kw)
        r_e = r_e.astype(enc_dtype)
    d_e = None
    if cfg.use_viewdirs and cfg.embed_view is not None:
        d_e, _ = embed(cfg.embed_view, d, dists=j_dists,
                       cutoff_dist=cutoff_dist, **pe_kw)
        d_e = d_e.astype(enc_dtype)
        if d_e.shape[1] == 1:
            d_e = jnp.broadcast_to(d_e, (d_e.shape[0], pts.shape[1],
                                         d_e.shape[2]))
    return {'v': v_e, 'r': r_e, 'd': d_e}


def run_network(cfg: RenderConfig, params: Dict[str, Any],
                encoded: Dict[str, jnp.ndarray],
                framecodes: Optional[jnp.ndarray],
                sr_key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Concatenate encodings and apply the MLP over all (R, S) points
    (raycasters.py:557-577, without the netchunk loop)."""
    parts = [encoded['v']]
    if encoded['r'] is not None:
        parts.append(encoded['r'])
    pts_in = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
    views_in = encoded['d']
    fc = None
    if framecodes is not None:
        fc = jnp.broadcast_to(framecodes[:, None],
                              pts_in.shape[:2] + (framecodes.shape[-1],))
    use_sr = cfg.sr_grads and sr_key is not None
    return apply_nerf(params, cfg.nerf, pts_in, views_in, fc,
                      compute_dtype=cfg.dtype,
                      fast_grads=cfg.eff_fast_mlp or use_sr,
                      alpha_f32=cfg.alpha_f32,
                      sr_key=sr_key if use_sr else None)


def cull_samples(cfg: RenderConfig, z_vals: jnp.ndarray, pts: jnp.ndarray,
                 kps: jnp.ndarray, cutoff_dist: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-budget occupancy culling: keep cfg.n_keep samples per ray.

    Keeps the in-window samples (any joint within cutoff*(1+margin)) in z
    order; when a ray has fewer in-window samples than the budget, the
    nearest out-of-window samples pad the set (they render exactly as in
    the un-culled path). Per-joint distance is rotation-invariant
    (|w2l(p)| == |p - joint|), so the score needs no skeleton transform.
    Static shapes throughout: (R, S) -> (R, n_keep).
    """
    # |p - k|^2 = |p|^2 - 2 p.k + |k|^2 with the cross term as a batched
    # (S, 3) @ (3, J) matmul — keeps J on the lane axis (the direct
    # (R, J, S, 3) difference puts 3-vectors on lanes at 3/128 utilization)
    pk = jnp.einsum('rsc,rjc->rsj', pts, kps,
                    precision='highest')                    # (R, S, J)
    d2 = (jnp.sum(pts * pts, -1)[..., None]
          - 2.0 * pk + jnp.sum(kps * kps, -1)[:, None])     # (R, S, J)
    cut = cutoff_dist * (1.0 + cfg.cull_margin)
    in_window = jnp.any(d2 < (cut * cut)[None, None, :], axis=-1)  # (R, S)

    # Evenly-strided selection among the in-window samples: when a ray has
    # more in-window samples than the budget, taking the FIRST n_keep by z
    # truncates the far side of the body (measured as a silhouette-ring
    # quality cost on the hard fixture). Pick ranks spread across the
    # whole in-window span instead: keep in-window sample of rank r iff
    # ceil(r*K/c) increments, which selects min(c, K) evenly spaced ones.
    K = cfg.n_keep
    rank = jnp.cumsum(in_window, axis=-1)                   # 1-based ranks
    c = jnp.maximum(rank[:, -1:], 1)
    sel_in = in_window & (jnp.ceil(rank * K / c)
                          > jnp.ceil((rank - 1) * K / c))
    # partition: selected (by z) first, everything else (by z) after;
    # z_vals is ascending so one stable key sort does both. When c < K the
    # remaining budget fills with the nearest non-selected samples by z.
    span = z_vals[:, -1:] - z_vals[:, :1] + 1e-6
    key_order = jnp.where(sel_in, 0.0, 1.0) * (span * 4.0) + z_vals
    order = jnp.argsort(key_order, axis=-1)[:, :K]
    z_k = take_rows(z_vals, order)
    # restore ascending z among the kept set (mixed groups break it)
    z_order = jnp.argsort(z_k, -1)
    sel = take_rows(order, z_order)                         # (R, n_keep)
    # one fused MXU gather for z + pts (see ops/gather.py)
    kept = take_rows(jnp.concatenate([z_vals[..., None], pts], -1), sel)
    return kept[..., 0], kept[..., 1:]


def _sample_pts(key, rays_o, rays_d, z_vals, ray_noise_std):
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    if ray_noise_std > 0.0 and key is not None:
        pts = pts + jax.random.normal(key, pts.shape, pts.dtype) * ray_noise_std
    return pts


def render_rays(params: Dict[str, Any],
                cfg: RenderConfig,
                ray_batch: jnp.ndarray,
                kp_batch: jnp.ndarray,
                skts: jnp.ndarray,
                bones: Optional[jnp.ndarray],
                cyls: jnp.ndarray,
                cam_idxs: Optional[jnp.ndarray] = None,
                rng: Optional[jax.Array] = None,
                tau: jnp.ndarray = jnp.float32(2000.0),
                alpha_sched: Optional[jnp.ndarray] = None,
                eval_framecode_mean: bool = False,
                ) -> Dict[str, jnp.ndarray]:
    """Volumetric rendering of a packed ray batch (raycasters.py:361-474).

    ray_batch: (R, 8|11) packed [o, d, near, far, (viewdirs)].
    params: {'coarse', 'fine', 'cutoff_dist'} pytree.
    Returns dict with rgb_map/disp_map/acc_map/alpha (+ *0 coarse outputs).
    """
    keys = jax.random.split(rng, 7) if rng is not None else [None] * 7

    rays_o, rays_d = ray_batch[:, 0:3], ray_batch[:, 3:6]
    near, far = ray_batch[:, 6:7], ray_batch[:, 7:8]

    near, far = get_near_far_in_cylinder(rays_o, rays_d, cyls,
                                         near=near, far=far)
    z_vals = sample_from_lineseg(keys[0], near, far, cfg.n_samples,
                                 cfg.perturb, cfg.lindisp)
    pts = _sample_pts(keys[1], rays_o, rays_d, z_vals, cfg.ray_noise_std)

    cutoff_dist = params['cutoff_dist']
    act_fn = get_density_fn(cfg.density_type, cfg.softplus_shift)

    if cfg.n_keep and cfg.n_keep < cfg.n_samples:
        z_vals, pts = cull_samples(cfg, z_vals, pts, kp_batch, cutoff_dist)

    framecodes = None
    if cfg.nerf.use_framecode:
        # cam_idxs=None (or render-time idx<0 semantics) -> mean code
        # (reference embedding.py:21-22)
        if cam_idxs is None:
            cam_idxs = jnp.zeros((rays_o.shape[0],), jnp.int32)
            eval_framecode_mean = True
        framecodes = lookup_framecodes(params['coarse'], cam_idxs,
                                       eval_mean=eval_framecode_mean)

    if cfg.use_fused:
        # fused Pallas path: transform+PE+MLP in one kernel (custom VJP)
        from ..kernels.fused_render import (fused_apply, pack_ray_data,
                                            pack_render_params)
        nf_kp = cfg.embed_kp.num_freqs
        nf_view = cfg.embed_view.num_freqs
        # cotangent precision in the fused backward follows the MLP
        # fast-grads knob: without it, cotangent matmuls stay f32
        # (value-preserving — the protocol-default numerics, fused)
        fused_bwd_f32 = not cfg.eff_fast_mlp
        packed = pack_render_params(params['coarse'], cfg.nerf, nf_kp,
                                    nf_view, cutoff_dist)
        m_all, aux = pack_ray_data(rays_d[:, None, :], skts, framecodes)
        net = lambda p, S: fused_apply(cfg.nerf, S, fused_bwd_f32, packed,
                                       p, m_all, aux, tau)
    else:
        encoded = encode_inputs(cfg, pts, rays_d[:, None, :], kp_batch,
                                skts, bones, cutoff_dist, tau, alpha_sched)

    if cfg.use_fused:
        raw = net(pts, pts.shape[1])
    else:
        raw = run_network(cfg, params['coarse'], encoded, framecodes,
                          sr_key=keys[5])
    ret = raw2outputs(raw, z_vals, rays_d, cfg.raw_noise_std, keys[2],
                      cfg.density_scale, act_fn, cfg.rgb_eps)

    ret0 = None
    if cfg.n_importance > 0:
        ret0 = ret
        z_all, z_samples, merge_ranks = isample_from_lineseg(
            keys[3], z_vals, ret0['weights'], cfg.n_importance,
            det=(cfg.perturb == 0.0), is_only=cfg.single_net)
        pts_is = _sample_pts(keys[4], rays_o, rays_d, z_samples,
                             cfg.ray_noise_std)

        fine_params = params['coarse'] if cfg.single_net else params['fine']
        fc_fine = framecodes
        if cfg.nerf.use_framecode and not cfg.single_net:
            fc_fine = lookup_framecodes(params['fine'], cam_idxs,
                                        eval_mean=eval_framecode_mean)

        # The MLP is pointwise, so sample ORDER is irrelevant until
        # compositing: run it on the unsorted [coarse ++ new] concat and sort
        # only the (R, S+I, 4) raw outputs. (The reference instead sorts the
        # full merged encodings before the MLP, raycasters.py:456-469 — a
        # >100x-larger gather that lowers catastrophically on TPU.)
        if cfg.use_fused:
            if not cfg.single_net:
                packed_f = pack_render_params(fine_params, cfg.nerf, nf_kp,
                                              nf_view, cutoff_dist)
                _, aux_f = pack_ray_data(rays_d[:, None, :], skts, fc_fine)
                pts_cat = jnp.concatenate([pts, pts_is], axis=1)
                raw_all = fused_apply(cfg.nerf, pts_cat.shape[1],
                                      fused_bwd_f32, packed_f,
                                      pts_cat, m_all, aux_f, tau)
            else:
                raw_is = net(pts_is, pts_is.shape[1])
                raw_all = jnp.concatenate([raw, raw_is], axis=1)
        elif not cfg.single_net:
            encoded_is = encode_inputs(cfg, pts_is, rays_d[:, None, :],
                                       kp_batch, skts, bones, cutoff_dist,
                                       tau, alpha_sched)
            cat_enc = {
                k: jnp.concatenate([encoded[k], encoded_is[k]], axis=1)
                if encoded[k] is not None else None
                for k in encoded}
            raw_all = run_network(cfg, fine_params, cat_enc, fc_fine,
                                  sr_key=keys[6])
        else:
            encoded_is = encode_inputs(cfg, pts_is, rays_d[:, None, :],
                                       kp_batch, skts, bones, cutoff_dist,
                                       tau, alpha_sched)
            # single-net: only the new samples go through the MLP
            raw_is = run_network(cfg, fine_params, encoded_is, fc_fine,
                                 sr_key=keys[6])
            raw_all = jnp.concatenate([raw, raw_is], axis=1)
        raw_fine = scatter_rows(raw_all, merge_ranks)
        ret = raw2outputs(raw_fine, z_all, rays_d, cfg.raw_noise_std, keys[2],
                          cfg.density_scale, act_fn, cfg.rgb_eps)

    out = {'rgb_map': ret['rgb_map'], 'disp_map': ret['disp_map'],
           'acc_map': ret['acc_map'], 'alpha': ret['alpha']}
    if ret0 is not None:
        out.update({'rgb0': ret0['rgb_map'], 'disp0': ret0['disp_map'],
                    'acc0': ret0['acc_map'], 'alpha0': ret0['alpha']})
    return out


def render_pts_density(params: Dict[str, Any], cfg: RenderConfig,
                       pts: jnp.ndarray, kps: jnp.ndarray,
                       skts: jnp.ndarray, bones: Optional[jnp.ndarray],
                       tau: jnp.ndarray = jnp.float32(2000.0),
                       use_fine: bool = True) -> jnp.ndarray:
    """Raw density of arbitrary query points (raycasters.py:597-648).

    pts: (R, S, 3) with kps/skts broadcast (R may be 1). Returns (R, S, 1).
    """
    cutoff_dist = params['cutoff_dist']
    encoded = encode_inputs(cfg, pts, jnp.zeros_like(pts[:, :1]),
                            kps, skts, bones, cutoff_dist, tau, None)
    parts = [encoded['v']]
    if encoded['r'] is not None:
        parts.append(encoded['r'])
    pts_in = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
    net = params['fine'] if (use_fine and params.get('fine') is not None) \
        else params['coarse']
    h = forward_density(net, cfg.nerf, pts_in, cfg.dtype)
    if 'alpha_linear' in net:
        return _dense(net['alpha_linear'], h, cfg.dtype)
    # use_viewdirs=False head: density is output_linear's last channel
    # (the reference's density query assumes alpha_linear and would crash
    # on such a model, core/raycasters.py:643)
    return _dense(net['output_linear'], h, cfg.dtype)[..., 3:4]


def render_mesh_density(params: Dict[str, Any], cfg: RenderConfig,
                        kps: jnp.ndarray, skts: jnp.ndarray,
                        bones: Optional[jnp.ndarray],
                        radius: float = 1.0, res: int = 64,
                        tau: jnp.ndarray = jnp.float32(2000.0)) -> jnp.ndarray:
    """Density on a res^3 grid centered at the root joint
    (raycasters.py:579-595). Returns (res+1, res+1, res+1) raw density."""
    t = jnp.linspace(-radius, radius, res + 1)
    grid = jnp.stack(jnp.meshgrid(t, t, t), axis=-1).astype(jnp.float32)
    sh = grid.shape
    pts = grid.reshape(1, -1, 3) + kps[0:1, 0:1]
    sigma = render_pts_density(params, cfg, pts, kps[:1], skts[:1],
                               None if bones is None else bones[:1], tau)
    return sigma.reshape(sh[:-1]).swapaxes(0, 1)
