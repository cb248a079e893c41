"""Pallas TPU kernel: cutoff-PE encoding + full NeRF MLP in one pass.

The flagship-path fusion (SURVEY §7 design delta 2). The XLA pipeline
materializes the 360-wide kp PE and 648-wide view PE in HBM between the
encode and MLP stages (reference analog: encode_inputs -> run_network,
core/raycasters.py:476-577). This kernel takes only the RAW skeleton-
relative quantities per point and computes everything on-chip.

Design (v2 — the v1 kernel lost to XLA on lane-relayout overhead):
  * inputs are packed 128-lane-ALIGNED: x (P, 512) f32 =
      [ v(24)+pad | bone_dirs(72)+pad | view_dirs(72)+pad | fc(16)+pad ]
    so every in-kernel slice starts at a multiple of 128.
  * the PE frequency scaling and cutoff-window replication are expressed as
    small constant MATMULS (v @ F_v -> all sin/cos angles k-major;
    w24 @ R -> per-channel windows), keeping the VPU work to full-width
    sin/cos/multiplies — no unaligned concats.
  * the MLP's first (and skip) layer consumes the PE blocks WITHOUT
    concatenation: the weight matrix is row-split at pack time
    (raw / sin / cos / bone blocks) and the products accumulate into the
    same (T, W) tile.
Everything matches models/nerf.py + ops/embedder.py numerically (bf16 MXU
matmuls for the big layers, f32 for PE precision).

Covers the standard config family (reldist + cutoff_inputs, reldir bones
with multires_bones=0, relray viewdirs with cutoff_viewdir); other embedder
branch modes fall back to the XLA path (see `fused_render_supported`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.nerf import NeRFConfig
from .fused_mlp import LANE, _rup

N_JOINTS = 24
SEG = 128                     # aligned segment width
IN_WIDTH = 4 * SEG            # [v | r | d | fc] segments


def fused_render_supported(rcfg) -> bool:
    """Static check that the RenderConfig matches the kernel family."""
    ek, ev, eb = rcfg.embed_kp, rcfg.embed_view, rcfg.embed_bone
    ncfg = rcfg.nerf
    return (
        rcfg.kp_dist_type == 'reldist'
        and rcfg.bone_type == 'reldir'
        and rcfg.view_type == 'relray'
        and rcfg.use_viewdirs
        and rcfg.skel.n_joints == N_JOINTS
        and ek is not None and ek.cutoff and ek.cutoff_inputs
        and not ek.dist_inputs and not ek.cut_to_cutoff
        and not ek.shift_inputs and not ek.normalize
        and not ek.freq_schedule
        and ev is not None and ev.cutoff and ev.cutoff_inputs
        and ev.dist_inputs and not ev.freq_schedule and not ev.normalize
        and (eb is None or eb.num_freqs == 0)
        and ncfg.input_ch == N_JOINTS * (1 + 2 * ek.num_freqs)
        and ncfg.input_ch_bones == 72
        and ncfg.input_ch_views == 72 * (1 + 2 * ev.num_freqs)
        and ncfg.width % LANE == 0 and (ncfg.width // 2) % LANE == 0
    )


def _freq_matrices(n_freq_kp: int, n_freq_view: int):
    """Constant matrices turning raw values/windows into PE operands.

    F_v  (SEG, NKv): angles_v = v_seg @ F_v, k-major blocks of 24.
    R_v  (SEG, NKv): window replication for the v bands.
    F_d  (SEG, NKd): angles_d = d_seg @ F_d, k-major blocks of 72.
    R_d  (SEG, NKd): w24 -> per-view-channel windows for the d bands.
    R72  (SEG, SEG): w24 -> 72-wide joint-major x3 window (raw d block).
    """
    # band widths padded to lane multiples so every matmul output and
    # elementwise op stays 128-aligned (pad columns are all-zero, and the
    # matching pad weight rows are zero, so they contribute nothing)
    NKv = _rup(n_freq_kp * N_JOINTS)
    NKd = _rup(n_freq_view * 72)
    F_v = np.zeros((SEG, NKv), np.float32)
    R_v = np.zeros((SEG, NKv), np.float32)
    for k in range(n_freq_kp):
        for j in range(N_JOINTS):
            F_v[j, k * N_JOINTS + j] = 2.0 ** k
            R_v[j, k * N_JOINTS + j] = 1.0
    F_d = np.zeros((SEG, NKd), np.float32)
    R_d = np.zeros((SEG, NKd), np.float32)
    for k in range(n_freq_view):
        for c in range(72):
            F_d[c, k * 72 + c] = 2.0 ** k
    for k in range(n_freq_view):
        for j in range(N_JOINTS):
            for t in range(3):
                R_d[j, k * 72 + j * 3 + t] = 1.0
    R72 = np.zeros((SEG, SEG), np.float32)
    for j in range(N_JOINTS):
        for t in range(3):
            R72[j, j * 3 + t] = 1.0
    return (jnp.asarray(F_v), jnp.asarray(R_v), jnp.asarray(F_d),
            jnp.asarray(R_d), jnp.asarray(R72))


def _row_split_kp(w: jnp.ndarray, n_freq: int):
    """Split a dnet weight's rows by PE block and reorder bands k-major.

    Input rows follow the embed() layout: blocks of 24 =
    [raw, sin f0, cos f0, sin f1, ...] then 72 bone rows.
    Returns (w_raw (SEG, W), w_sin (NK, W), w_cos (NK, W), w_bone (SEG, W)).
    """
    W = w.shape[1]
    raw = w[:N_JOINTS]
    sin_rows = [w[N_JOINTS + k * 48: N_JOINTS + k * 48 + 24]
                for k in range(n_freq)]
    cos_rows = [w[N_JOINTS + k * 48 + 24: N_JOINTS + k * 48 + 48]
                for k in range(n_freq)]
    bone = w[N_JOINTS * (1 + 2 * n_freq):
             N_JOINTS * (1 + 2 * n_freq) + 72]
    pad = lambda m, rows: jnp.pad(m, ((0, rows - m.shape[0]), (0, 0)))
    sin = jnp.concatenate(sin_rows, 0)
    cos = jnp.concatenate(cos_rows, 0)
    return (pad(raw, SEG), pad(sin, _rup(sin.shape[0])),
            pad(cos, _rup(cos.shape[0])), pad(bone, SEG))


def _row_split_view(w: jnp.ndarray, n_freq: int, fc_ch: int):
    """Same split for the view weight rows: blocks of 72 =
    [raw, sin f0, cos f0, ...] then fc rows."""
    raw = w[:72]
    sin_rows = [w[72 + k * 144: 72 + k * 144 + 72] for k in range(n_freq)]
    cos_rows = [w[72 + k * 144 + 72: 72 + k * 144 + 144]
                for k in range(n_freq)]
    base = 72 * (1 + 2 * n_freq)
    fc = w[base: base + fc_ch] if fc_ch else jnp.zeros((0, w.shape[1]))
    pad = lambda m, rows: jnp.pad(m, ((0, rows - m.shape[0]), (0, 0)))
    sin = jnp.concatenate(sin_rows, 0)
    cos = jnp.concatenate(cos_rows, 0)
    return (pad(raw, SEG), pad(sin, _rup(sin.shape[0])),
            pad(cos, _rup(cos.shape[0])), pad(fc, SEG))


def pack_render_params(params: Dict[str, Any], ncfg: NeRFConfig,
                       n_freq_kp: int, n_freq_view: int,
                       cutoff_dist: jnp.ndarray) -> Dict[str, Any]:
    """Pad/split/cast one network's params + constants for the kernel."""
    W = ncfg.width
    bf = jnp.bfloat16
    out: Dict[str, Any] = {}
    tl = params['pts_linears']

    def split_kp_to(prefix, w):
        r, s, c, b = _row_split_kp(w, n_freq_kp)
        out[f'{prefix}_raw'] = r.astype(bf)
        out[f'{prefix}_sin'] = s.astype(bf)
        out[f'{prefix}_cos'] = c.astype(bf)
        out[f'{prefix}_bone'] = b.astype(bf)

    split_kp_to('w0', tl[0]['w'])
    out['b0'] = jnp.asarray(tl[0]['b'], jnp.float32)
    dnet = ncfg.dnet_input
    for i in range(1, ncfg.depth):
        w = tl[i]['w']
        if (i - 1) in ncfg.skips:
            split_kp_to(f'w{i}x', w[:dnet])
            out[f'w{i}h'] = jnp.asarray(w[dnet:], bf)
        else:
            out[f'w{i}'] = jnp.asarray(w, bf)
        out[f'b{i}'] = jnp.asarray(tl[i]['b'], jnp.float32)

    out['wf'] = jnp.asarray(params['feature_linear']['w'], bf)
    out['bf'] = jnp.asarray(params['feature_linear']['b'], jnp.float32)

    vl = params['views_linears'][0]
    out['wv_f'] = jnp.asarray(vl['w'][:W], bf)
    fc_ch = ncfg.framecode_ch if ncfg.use_framecode else 0
    r, s, c, fc = _row_split_view(vl['w'][W:], n_freq_view, fc_ch)
    out['wv_raw'] = r.astype(bf)
    out['wv_sin'] = s.astype(bf)
    out['wv_cos'] = c.astype(bf)
    out['wv_fc'] = fc.astype(bf)
    out['bv'] = jnp.asarray(vl['b'], jnp.float32)

    wr = params['rgb_linear']['w']
    wa = params['alpha_linear']['w']
    out['w_rgb'] = jnp.pad(wr, ((0, 0), (0, LANE - wr.shape[1]))).astype(bf)
    wa_pad = jnp.zeros((W, LANE), jnp.float32).at[:, 3:4].set(
        jnp.asarray(wa))
    out['w_alpha'] = wa_pad.astype(bf)
    b_out = jnp.zeros((LANE,), jnp.float32)
    b_out = b_out.at[:3].set(jnp.asarray(params['rgb_linear']['b']))
    b_out = b_out.at[3].set(jnp.asarray(params['alpha_linear']['b'])[0])
    out['b_out'] = b_out

    F_v, R_v, F_d, R_d, R72 = _freq_matrices(n_freq_kp, n_freq_view)
    out['F_v'], out['R_v'] = F_v, R_v
    out['F_d'], out['R_d'], out['R72'] = F_d, R_d, R72
    cut = jnp.zeros((1, SEG), jnp.float32).at[0, :N_JOINTS].set(
        cutoff_dist.reshape(-1)[:N_JOINTS])
    out['cut'] = cut
    return out


def _names(ncfg: NeRFConfig):
    names = ['w0_raw', 'w0_sin', 'w0_cos', 'w0_bone', 'b0']
    for i in range(1, ncfg.depth):
        if (i - 1) in ncfg.skips:
            names += [f'w{i}x_raw', f'w{i}x_sin', f'w{i}x_cos',
                      f'w{i}x_bone', f'w{i}h', f'b{i}']
        else:
            names += [f'w{i}', f'b{i}']
    names += ['wf', 'bf', 'wv_f', 'wv_raw', 'wv_sin', 'wv_cos', 'wv_fc',
              'bv', 'w_rgb', 'w_alpha', 'b_out',
              'F_v', 'R_v', 'F_d', 'R_d', 'R72', 'cut']
    return names


def _render_kernel(ncfg: NeRFConfig, x_ref, tau_ref, *refs):
    names = _names(ncfg)
    w = {}
    for name, ref in zip(names, refs[:-1]):
        arr = ref[:]
        if name.startswith('b') and name != 'b_out':
            arr = arr.reshape(-1)
        w[name] = arr
    out_ref = refs[-1]
    f32 = jnp.float32
    bf = jnp.bfloat16

    x = x_ref[:]
    v = x[:, 0:SEG]          # dists in lanes 0:24
    r = x[:, SEG:2 * SEG]    # bone dirs in lanes 0:72
    d = x[:, 2 * SEG:3 * SEG]
    fc = x[:, 3 * SEG:4 * SEG]

    tau = tau_ref[0, 0]
    # window on the padded segment; pad lanes produce garbage but their
    # weight rows are zero, so they never reach the MLP
    w24 = 1.0 - jax.nn.sigmoid(tau * (v - w['cut'].reshape(-1)))

    ang_v = jnp.dot(v, w['F_v'], preferred_element_type=f32)
    wrep_v = jnp.dot(w24, w['R_v'], preferred_element_type=f32)
    sv = (jnp.sin(ang_v) * wrep_v).astype(bf)
    cv = (jnp.cos(ang_v) * wrep_v).astype(bf)
    vraw = (v * w24).astype(bf)

    ang_d = jnp.dot(d, w['F_d'], preferred_element_type=f32)
    wrep_d = jnp.dot(w24, w['R_d'], preferred_element_type=f32)
    sd = (jnp.sin(ang_d) * wrep_d).astype(bf)
    cd = (jnp.cos(ang_d) * wrep_d).astype(bf)
    w72 = jnp.dot(w24, w['R72'], preferred_element_type=f32)
    draw = (d * w72).astype(bf)
    rb = r.astype(bf)
    fcb = fc.astype(bf)

    def kp_matmul(prefix, hb=None, wh=None):
        acc = jnp.dot(vraw, w[f'{prefix}_raw'], preferred_element_type=f32)
        acc += jnp.dot(sv, w[f'{prefix}_sin'], preferred_element_type=f32)
        acc += jnp.dot(cv, w[f'{prefix}_cos'], preferred_element_type=f32)
        acc += jnp.dot(rb, w[f'{prefix}_bone'], preferred_element_type=f32)
        if hb is not None:
            acc += jnp.dot(hb, wh, preferred_element_type=f32)
        return acc

    h = jnp.maximum(kp_matmul('w0') + w['b0'], 0.0)
    for i in range(1, ncfg.depth):
        hb = h.astype(bf)
        if (i - 1) in ncfg.skips:
            acc = kp_matmul(f'w{i}x', hb, w[f'w{i}h'])
        else:
            acc = jnp.dot(hb, w[f'w{i}'], preferred_element_type=f32)
        h = jnp.maximum(acc + w[f'b{i}'], 0.0)

    hb = h.astype(bf)
    feat = jnp.dot(hb, w['wf'], preferred_element_type=f32) + w['bf']
    hv = jnp.dot(feat.astype(bf), w['wv_f'], preferred_element_type=f32)
    hv += jnp.dot(draw, w['wv_raw'], preferred_element_type=f32)
    hv += jnp.dot(sd, w['wv_sin'], preferred_element_type=f32)
    hv += jnp.dot(cd, w['wv_cos'], preferred_element_type=f32)
    hv += jnp.dot(fcb, w['wv_fc'], preferred_element_type=f32)
    hv = jnp.maximum(hv + w['bv'], 0.0)

    out = jnp.dot(hv.astype(bf), w['w_rgb'], preferred_element_type=f32)
    out += jnp.dot(hb, w['w_alpha'], preferred_element_type=f32)
    out_ref[:] = out + w['b_out'].reshape(1, -1)


@functools.partial(jax.jit, static_argnums=(0, 3))
def fused_encode_mlp(ncfg: NeRFConfig, packed: Dict[str, Any],
                     x_aligned: jnp.ndarray,
                     tile: int = 1024,
                     tau: jnp.ndarray = 2000.0) -> jnp.ndarray:
    """x_aligned (P, 512) f32 segment-packed raw inputs -> raw (P, 4)."""
    P = x_aligned.shape[0]
    P_pad = _rup(P, tile)
    x = jnp.pad(x_aligned, ((0, P_pad - P), (0, 0)))
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1, 1)

    names = _names(ncfg)
    weight_args = [packed[n] if packed[n].ndim == 2 else
                   packed[n].reshape(1, -1) for n in names]

    grid = (P_pad // tile,)
    in_specs = [
        pl.BlockSpec((tile, IN_WIDTH), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    for arg in weight_args:
        in_specs.append(pl.BlockSpec(arg.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_render_kernel, ncfg)
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, tau_arr, *weight_args)
    return out[:P, :4]


def build_raw_inputs(pts: jnp.ndarray, rays_d: jnp.ndarray,
                     skts: jnp.ndarray,
                     framecodes: jnp.ndarray | None) -> jnp.ndarray:
    """Assemble the (R, S, 512) segment-aligned raw kernel input from WORLD
    points. All per-joint 3-vector math stays in the flat joint-major
    layout (lane-parallel; see ops/encoding.py:transform_batch_pts_flat).

    pts (R, S, 3), rays_d (R, 1, 3), skts (R, J, 4, 4),
    framecodes (R, fc) or None.
    """
    from ..ops.encoding import (_expand3, _group3_sumsq,
                                transform_batch_pts_flat)
    R, S = pts.shape[:2]
    J = N_JOINTS

    pts_t = transform_batch_pts_flat(pts, skts)            # (R, S, 72)
    sumsq = _group3_sumsq(pts_t, J)                        # (R, S, 24)
    v = jnp.sqrt(jnp.maximum(sumsq, 0.0))
    inv = _expand3(1.0 / jnp.maximum(v, 1e-12), J)
    r = pts_t * inv                                        # (R, S, 72)

    rot_cols = skts[..., :3, :3].transpose(0, 3, 1, 2).reshape(R, 3, J * 3)
    rays_flat = jnp.einsum('rsb,rbc->rsc', rays_d, rot_cols)  # (R, 1, 72)
    dss = _group3_sumsq(rays_flat, J)
    dinv = _expand3(jax.lax.rsqrt(jnp.maximum(dss, 1e-24)), J)
    d = jnp.broadcast_to(rays_flat * dinv, (R, S, 72))

    z24 = jnp.zeros((R, S, SEG - J), jnp.float32)
    z72 = jnp.zeros((R, S, SEG - 72), jnp.float32)
    if framecodes is not None:
        fc = jnp.broadcast_to(framecodes[:, None],
                              (R, S, framecodes.shape[-1]))
    else:
        fc = jnp.zeros((R, S, 16), jnp.float32)
    zfc = jnp.zeros((R, S, SEG - fc.shape[-1]), jnp.float32)
    return jnp.concatenate([v, z24, r, z72, d, z72, fc, zfc], axis=-1)
