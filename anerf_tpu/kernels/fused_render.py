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

def _fast_sincos(x):
    """(sin x, cos x) via one shared range reduction + short polynomials.

    The PE stage is the kernel's dominant cost and jnp.sin/jnp.cos are
    its dominant ops (measured: tools/kernel_bench.py --decompose,
    PERF.md round 4). The band values feed the MLP through an immediate
    bfloat16 cast (rel 4e-3), so library-exact trig buys nothing; this
    pair is accurate to 3e-6 abs — ~1000x below the intended numerics —
    at roughly a third of the VPU ops:

      k = round(x/pi); r = x - k*pi (two-term pi, exact to |k|~1e5)
      sin x = (-1)^k * r*P3(r^2);  cos x = (-1)^k * Q4(r^2)

    with P3/Q4 least-squares fits on [-pi/2, pi/2] (max err 3.0e-6 /
    1.3e-7, /tmp-fit regenerable from the coefficients' docstring).
    Autodiff is exact a.e. (round/sign contribute zero cotangent), so
    the jax.grad'd pure-jnp replica in tests stays consistent.
    Patchable (tools/kernel_bench.py --decompose swaps in stand-ins to
    attribute trig cost)."""
    f32 = jnp.float32
    x = x.astype(f32)
    k = jnp.round(x * f32(0.3183098861837907))
    r = x - k * f32(3.1415927410125732) - k * f32(-8.742277657347586e-08)
    t = r * r
    s = r * (f32(9.9999947025e-01) + t * (f32(-1.6665891424e-01)
             + t * (f32(8.3159662064e-03) + t * f32(-1.8609024888e-04))))
    c = (f32(9.9999996727e-01) + t * (f32(-4.9999926897e-01)
         + t * (f32(4.1664091340e-02) + t * (f32(-1.3857421663e-03)
                + t * f32(2.3237641653e-05)))))
    half = k * 0.5
    sign = 1.0 - 4.0 * jnp.abs(half - jnp.round(half))   # (-1)^k
    return s * sign, c * sign


#: sin/cos pair used by the PE stage — patchable by
#: tools/kernel_bench.py's --decompose trig variants to attribute the
#: transcendental share of the PE stage cost. Production code never
#: changes this.
_SINCOS = _fast_sincos


# ---- exact-geometry dots ------------------------------------------------
# On TPU, f32 matmuls at Precision.DEFAULT run as a SINGLE bf16 MXU pass:
# operands are truncated to 8 mantissa bits. For the geometry dots below
# that is NOT acceptable — a 4e-3 relative error on a distance v becomes
# 2^k*v*4e-3 ~ 0.5 rad of PE angle error at k=6, and flips tau=2000
# sigmoid cutoff windows (measured: raw-output error 0.054 abs / 16% rel
# vs the exact replica, tools/pe_fidelity.py). The fix is the classic
# hi/lo split: x = hi + lo with hi = bf16(x) EXACTLY representable, so
# dot(hi, M) is lossless and only the small residual lo (|lo| <= 4e-3|x|)
# is truncated — total relative error ~1.6e-5, ~250x below the kernel's
# intended bf16 output numerics. Cost: one extra MXU pass per dot (two
# for value*value), on dots that are a small share of the kernel's FLOPs.

def _hi_lo(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot_vo(x, M):
    """x (values, f32) @ M (EXACT in bf16: one-hot / powers of two)."""
    hi, lo = _hi_lo(x)
    f32 = jnp.float32
    return (jnp.dot(hi, M, preferred_element_type=f32)
            + jnp.dot(lo, M, preferred_element_type=f32))


def _dot_ov(oh, x):
    """oh (EXACT in bf16) @ x (values, f32)."""
    hi, lo = _hi_lo(x)
    f32 = jnp.float32
    return (jnp.dot(oh, hi, preferred_element_type=f32)
            + jnp.dot(oh, lo, preferred_element_type=f32))


def _dg_vo(x, M, dims):
    """dot_general(x, M, dims) with x split (M exact in bf16)."""
    hi, lo = _hi_lo(x)
    f32 = jnp.float32
    return (jax.lax.dot_general(hi, M, (dims, ((), ())),
                                preferred_element_type=f32)
            + jax.lax.dot_general(lo, M, (dims, ((), ())),
                                  preferred_element_type=f32))


def _dg_ov(oh, x, dims):
    """dot_general(oh, x, dims) with x split (oh exact in bf16)."""
    hi, lo = _hi_lo(x)
    f32 = jnp.float32
    return (jax.lax.dot_general(oh, hi, (dims, ((), ())),
                                preferred_element_type=f32)
            + jax.lax.dot_general(oh, lo, (dims, ((), ())),
                                  preferred_element_type=f32))


def _dg_vv(a, b, dims):
    """dot_general(a, b, dims), both real-valued: bf16x3 passes
    (a_hi*b_hi + a_hi*b_lo + a_lo*b_hi), relative error ~1e-5."""
    ah, al = _hi_lo(a)
    bh, bl = _hi_lo(b)
    f32 = jnp.float32
    dg = lambda x, y: jax.lax.dot_general(x, y, (dims, ((), ())),
                                          preferred_element_type=f32)
    return dg(ah, bh) + dg(ah, bl) + dg(al, bh)


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
    # zero bands (e.g. multires_views=0 in the reference's
    # surreal_single.txt) keep ONE all-zero LANE block: 0-width operands
    # are illegal in Mosaic tiling, and the zero F/R/weight blocks
    # contribute nothing to the accumulators
    NKv = _rup(n_freq_kp * N_JOINTS) or LANE
    NKd = _rup(n_freq_view * 72) or LANE
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
    empty = jnp.zeros((0, W), w.dtype)
    sin = jnp.concatenate(sin_rows, 0) if sin_rows else empty
    cos = jnp.concatenate(cos_rows, 0) if cos_rows else empty
    # zero-band nets pad to one LANE block of zero rows (matches the
    # aux builder's NKv floor; 0-row operands break Mosaic tiling)
    return (pad(raw, SEG), pad(sin, _rup(sin.shape[0]) or LANE),
            pad(cos, _rup(cos.shape[0]) or LANE), pad(bone, SEG))


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
    empty = jnp.zeros((0, w.shape[1]), w.dtype)
    sin = jnp.concatenate(sin_rows, 0) if sin_rows else empty
    cos = jnp.concatenate(cos_rows, 0) if cos_rows else empty
    # multires_views=0 (surreal_single.txt) pads to one LANE block of
    # zero rows, matching the aux builder's NKd floor
    return (pad(raw, SEG), pad(sin, _rup(sin.shape[0]) or LANE),
            pad(cos, _rup(cos.shape[0]) or LANE), pad(fc, SEG))


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


def _read_weights(ncfg: NeRFConfig, refs):
    names = _names(ncfg)
    w = {}
    for name, ref in zip(names, refs):
        arr = ref[:]
        if name.startswith('b') and name != 'b_out':
            arr = arr.reshape(-1)
        w[name] = arr
    return w


def _forward_trace(ncfg: NeRFConfig, w, v, r, d, fc, tau,
                   d_ray=None, B=None):
    """Cutoff-PE + full MLP on segment-aligned inputs, all in VMEM.

    v/r/d/fc are (T, SEG) f32 with 24/72/72/fc_ch valid lanes (pad lanes
    may hold garbage — their weight rows are zero). Returns (out, cache);
    the cache holds every intermediate the backward kernel needs (Mosaic
    dead-code-eliminates unused entries in the forward-only kernels).

    d_ray (TR, SEG) + B (T, TR one-hot), when given, enable the per-ray
    view-PE fast path: the view dirs are CONSTANT across a ray's S
    samples, so sin/cos of the 2^k*d angle bands are computed on the TR
    per-ray rows (S x fewer transcendentals — the PE stage dominates the
    kernel, see PERF.md round 4) and expanded to the T point rows by the
    exact one-hot matmul. Identical math; the per-point path remains for
    the packed-input (v2) kernel which has no ray structure.
    """
    f32 = jnp.float32
    bf = jnp.bfloat16
    c: Dict[str, Any] = {}
    # window on the padded segment; pad lanes produce garbage but their
    # weight rows are zero, so they never reach the MLP
    w24 = 1.0 - jax.nn.sigmoid(tau * (v - w['cut'].reshape(-1)))

    ang_v = _dot_vo(v, w['F_v'])
    # windows are in [0,1] and multiply bands that are cast to bf16 right
    # after: single-pass (4e-3) is at the intended numerics already
    wrep_v = jnp.dot(w24, w['R_v'], preferred_element_type=f32)
    sin_v, cos_v = _SINCOS(ang_v)
    sv = (sin_v * wrep_v).astype(bf)
    cv = (cos_v * wrep_v).astype(bf)
    vraw = (v * w24).astype(bf)

    wrep_d = jnp.dot(w24, w['R_d'], preferred_element_type=f32)
    if d_ray is not None:
        ang_d_ray = _dot_vo(d_ray, w['F_d'])           # (TR, NKd)
        s_ray, c_ray = _SINCOS(ang_d_ray)
        sin_d = _dot_ov(B, s_ray)                      # (T, NKd)
        cos_d = _dot_ov(B, c_ray)
    else:
        ang_d = _dot_vo(d, w['F_d'])
        sin_d, cos_d = _SINCOS(ang_d)
    sd = (sin_d * wrep_d).astype(bf)
    cd = (cos_d * wrep_d).astype(bf)
    w72 = jnp.dot(w24, w['R72'], preferred_element_type=f32)
    draw = (d * w72).astype(bf)
    rb = r.astype(bf)
    fcb = fc.astype(bf)
    c.update(w24=w24, wrep_v=wrep_v, sin_v=sin_v, cos_v=cos_v,
             wrep_d=wrep_d, sin_d=sin_d, cos_d=cos_d, w72=w72,
             sv=sv, cv=cv, vraw=vraw, sd=sd, cd=cd, draw=draw,
             rb=rb, fcb=fcb)

    def kp_matmul(prefix, hb=None, wh=None):
        acc = jnp.dot(vraw, w[f'{prefix}_raw'], preferred_element_type=f32)
        acc += jnp.dot(sv, w[f'{prefix}_sin'], preferred_element_type=f32)
        acc += jnp.dot(cv, w[f'{prefix}_cos'], preferred_element_type=f32)
        acc += jnp.dot(rb, w[f'{prefix}_bone'], preferred_element_type=f32)
        if hb is not None:
            acc += jnp.dot(hb, wh, preferred_element_type=f32)
        return acc

    hbs = []
    h = jnp.maximum(kp_matmul('w0') + w['b0'], 0.0)
    for i in range(1, ncfg.depth):
        hb = h.astype(bf)
        hbs.append(hb)
        if (i - 1) in ncfg.skips:
            acc = kp_matmul(f'w{i}x', hb, w[f'w{i}h'])
        else:
            acc = jnp.dot(hb, w[f'w{i}'], preferred_element_type=f32)
        h = jnp.maximum(acc + w[f'b{i}'], 0.0)

    hb = h.astype(bf)
    hbs.append(hb)
    feat = jnp.dot(hb, w['wf'], preferred_element_type=f32) + w['bf']
    featb = feat.astype(bf)
    hv = jnp.dot(featb, w['wv_f'], preferred_element_type=f32)
    hv += jnp.dot(draw, w['wv_raw'], preferred_element_type=f32)
    hv += jnp.dot(sd, w['wv_sin'], preferred_element_type=f32)
    hv += jnp.dot(cd, w['wv_cos'], preferred_element_type=f32)
    hv += jnp.dot(fcb, w['wv_fc'], preferred_element_type=f32)
    hv = jnp.maximum(hv + w['bv'], 0.0)
    hvb = hv.astype(bf)
    c.update(hbs=hbs, featb=featb, hvb=hvb)

    out = jnp.dot(hvb, w['w_rgb'], preferred_element_type=f32)
    out += jnp.dot(hb, w['w_alpha'], preferred_element_type=f32)
    return out + w['b_out'].reshape(1, -1), c


def _pe_mlp_body(ncfg: NeRFConfig, w, v, r, d, fc, tau,
                 d_ray=None, B=None):
    return _forward_trace(ncfg, w, v, r, d, fc, tau, d_ray=d_ray, B=B)[0]


def _render_kernel(ncfg: NeRFConfig, x_ref, tau_ref, *refs):
    w = _read_weights(ncfg, refs[:-1])
    out_ref = refs[-1]
    x = x_ref[:]
    v = x[:, 0:SEG]          # dists in lanes 0:24
    r = x[:, SEG:2 * SEG]    # bone dirs in lanes 0:72
    d = x[:, 2 * SEG:3 * SEG]
    fc = x[:, 3 * SEG:4 * SEG]
    out_ref[:] = _pe_mlp_body(ncfg, w, v, r, d, fc, tau_ref[0, 0])


def _transform_tile(S: int, TR: int, pts_ref, m_ref, aux_ref):
    """World->local transform for one tile of TR rays x S samples.

    Per-ray quantities are expanded to the T = TR*S point rows with small
    one-hot MXU matmuls built from iota comparisons (no gathers, no lane
    relayouts). Returns a cache with the encoder inputs (v, r, d, fc) and
    every intermediate the backward needs.
    """
    f32 = jnp.float32
    T = TR * S

    x3 = pts_ref[:]                                   # (T, 3)
    # row -> ray id (row // S), as one-hot (T, TR) for per-ray expansion
    row_ray = jax.lax.broadcasted_iota(jnp.int32, (T, TR), 0) // S
    col_ray = jax.lax.broadcasted_iota(jnp.int32, (T, TR), 1)
    B = (row_ray == col_ray).astype(f32)              # (T, TR)

    # xp3[row, 3*ray + i] = pts[row, i]: tile then mask
    T3 = (jax.lax.broadcasted_iota(jnp.int32, (3, TR * 3), 1) % 3
          == jax.lax.broadcasted_iota(jnp.int32, (3, TR * 3), 0)
          ).astype(f32)
    rep = _dot_vo(x3, T3)                             # (T, TR*3)
    rr = jax.lax.broadcasted_iota(jnp.int32, (T, TR * 3), 0) // S
    cc = jax.lax.broadcasted_iota(jnp.int32, (T, TR * 3), 1) // 3
    mask = (rr == cc).astype(f32)
    xp3 = rep * mask

    M = m_ref[:]                                      # (TR*3, SEG)
    aux_raw = aux_ref[:]                              # (TR, 3*SEG), per-ray
    aux = _dg_ov(B, aux_raw, ((1,), (0,)))            # (T, 3*SEG)
    trans = aux[:, 0:SEG]
    d = aux[:, SEG:2 * SEG]
    fc = aux[:, 2 * SEG:3 * SEG]
    d_ray = aux_raw[:, SEG:2 * SEG]                   # (TR, SEG) unit dirs

    # local coords, distances, unit dirs (ops/encoding.py flat layout)
    pts_t = _dg_vv(xp3, M, ((1,), (0,))) + trans
    G = ((jax.lax.broadcasted_iota(jnp.int32, (SEG, SEG), 0) // 3
          == jax.lax.broadcasted_iota(jnp.int32, (SEG, SEG), 1))
         & (jax.lax.broadcasted_iota(jnp.int32, (SEG, SEG), 0) < 72)
         ).astype(f32)                                 # (c, c//3) for c<72
    v2s = _dot_vo(pts_t * pts_t, G)
    # floor keeps sqrt autodiff-safe on the all-zero pad lanes (the pure
    # jnp replica of this tile math is jax.grad'd in tests)
    v = jnp.sqrt(jnp.maximum(v2s, 1e-24))              # lanes 0:24
    vinv = 1.0 / jnp.maximum(v, 1e-12)
    # single-pass is fine here: r feeds the MLP through a bf16 cast, so
    # 4e-3 relative on the unit dirs is at the intended numerics already
    vexp = jnp.dot(vinv, G.T, preferred_element_type=f32)
    r_dirs = pts_t * vexp
    return dict(B=B, T3=T3, mask=mask, xp3=xp3, M=M, G=G,
                pts_t=pts_t, v=v, vinv=vinv, vexp=vexp,
                r=r_dirs, d=d, fc=fc, d_ray=d_ray)


#: HBM lanes for the pts-kernel raw output and the backward's cotangent
#: input. The MLP's padded output head is LANE (128) wide but only lanes
#: 0:4 (alpha+rgb) are live — writing/reading all 128 f32 lanes is ~67 MB
#: of pure padding traffic per strict-shape call. 8 (not 4) keeps the
#: minor dim sublane-friendly for Mosaic's narrow stores.
GOUT = 8


def _render_kernel_pts(ncfg: NeRFConfig, S: int, TR: int,
                       pts_ref, m_ref, aux_ref, tau_ref, *refs):
    """v3 forward: world->local transform + PE + MLP in one kernel."""
    w = _read_weights(ncfg, refs[:-1])
    out_ref = refs[-1]
    t = _transform_tile(S, TR, pts_ref, m_ref, aux_ref)
    out = _pe_mlp_body(ncfg, w, t['v'], t['r'], t['d'], t['fc'],
                       tau_ref[0, 0], d_ray=t['d_ray'], B=t['B'])
    out_ref[:] = out[:, :out_ref.shape[-1]]


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


def _pick_tr(S: int, max_t: int = 1024) -> int:
    """Rays per tile: the largest multiple of 8 with TR*S <= max_t
    (min 8 — the per-ray blocks m_all (TR*3, SEG) and aux (TR, 3*SEG)
    need sublane-divisible row counts). The backward kernel uses a
    smaller max_t — its VMEM working set holds the recomputed
    activations plus the weight-grad accumulators."""
    return max(8, (max_t // S) // 8 * 8)


#: Measured per-shape tile budgets (tools/kernel_bench.py slope sweeps on
#: v5e at the strict shapes S=64/80 and the cull-0.125 shapes S=8/24;
#: sweep rows in artifacts/kernel_tiles_r4.json). Keyed by sample count
#: S; values are the max_t handed to _pick_tr per kernel flavor. Shapes
#: not listed fall back to the pre-sweep defaults (fwd 1024; bwd 512
#: f32-cotangent / 1024 bf16) — small S (deep culling) needs LARGER ray
#: tiles to amortize the per-ray transform/VPU work (VERDICT r3 weak #4).
#: Round-5 small-P sweep (artifacts/kernel_tiles_r5.json, v5e, R=2048,
#: reps=8): max_t=512 is optimal for EVERY flavor at both cull-0.125
#: shapes — S=8: fwd 0.352/0.362/0.362 ms (256/512/1024, noise band),
#: bwd_f32 0.841 @512 (vs 1.007/1.123), bwd_bf16 0.928 @512 (vs 1.119
#: @1024 default, -17%); S=24: fwd 1.045 @512 (vs 1.076 @1024),
#: bwd_f32 2.769 @512 (vs 3.051-3.434), bwd_bf16 2.696 @512 (vs 3.143
#: @1024 default, -14%). 4096 compiles fail (scratch VMEM) at S=24 bwd.
_TILE_BUDGETS: Dict[int, Dict[str, int]] = {
    8: {'fwd': 512, 'bwd_f32': 512, 'bwd_bf16': 512},
    24: {'fwd': 512, 'bwd_f32': 512, 'bwd_bf16': 512},
}


def _tile_budget(S: int, flavor: str, default: int) -> int:
    return _TILE_BUDGETS.get(S, {}).get(flavor, default)


def pack_ray_data(rays_d: jnp.ndarray, skts: jnp.ndarray,
                  framecodes: jnp.ndarray | None):
    """Per-ray kernel operands for the pts-native (v3) kernel.

    rays_d (R, 1, 3), skts (R, J, 4, 4), framecodes (R, fc) ->
      m_all (R*3, SEG) f32: rotation columns (ops/encoding.py
        transform_batch_pts_flat layout), rows grouped per ray;
      aux (R, 3*SEG) f32: [trans(72) | unit view dirs(72) | fc(16)],
        each in its own 128-lane segment.
    """
    from ..ops.encoding import _expand3, _group3_sumsq
    R, J = skts.shape[0], skts.shape[1]
    rot_cols = skts[..., :3, :3].transpose(0, 3, 1, 2).reshape(R, 3, J * 3)
    trans = skts[..., :3, 3].reshape(R, J * 3)

    rays_flat = jnp.einsum('rsb,rbc->rsc', rays_d, rot_cols,
                           precision='highest')[:, 0]  # (R, 72)
    dss = _group3_sumsq(rays_flat, J)
    dinv = _expand3(jax.lax.rsqrt(jnp.maximum(dss, 1e-24)), J)
    d = rays_flat * dinv

    m_all = jnp.pad(rot_cols, ((0, 0), (0, 0), (0, SEG - J * 3))
                    ).reshape(R * 3, SEG).astype(jnp.float32)
    if framecodes is None:
        framecodes = jnp.zeros((R, 16), jnp.float32)
    seg = lambda a: jnp.pad(a, ((0, 0), (0, SEG - a.shape[-1])))
    aux = jnp.concatenate([seg(trans), seg(d), seg(framecodes)],
                          -1).astype(jnp.float32)
    return m_all, aux


@functools.partial(jax.jit, static_argnums=(0, 5, 7))
def fused_encode_mlp_pts(ncfg: NeRFConfig, packed: Dict[str, Any],
                         pts: jnp.ndarray, m_all: jnp.ndarray,
                         aux: jnp.ndarray, S: int,
                         tau: jnp.ndarray = 2000.0,
                         max_t: int | None = None) -> jnp.ndarray:
    """World points -> raw (R, S, 4), transform+PE+MLP all on-chip.

    pts (R, S, 3) f32; m_all/aux from pack_ray_data. The only HBM-side
    per-point tensor is pts itself (vs the (P, 512) packed input of
    fused_encode_mlp) — the raw-input assembly that cost ~2 ms at the
    flagship shape disappears into ~5 small in-kernel matmuls.
    """
    R = pts.shape[0]
    if max_t is None:
        max_t = _tile_budget(S, 'fwd', 1024)
    TR = _pick_tr(S, max_t=max_t)
    R_pad = _rup(R, TR)
    pts_p = jnp.pad(pts, ((0, R_pad - R), (0, 0), (0, 0))).reshape(
        R_pad * S, 3)
    m_p = jnp.pad(m_all, ((0, (R_pad - R) * 3), (0, 0)))
    aux_p = jnp.pad(aux, ((0, R_pad - R), (0, 0)))
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1, 1)

    names = _names(ncfg)
    weight_args = [packed[n] if packed[n].ndim == 2 else
                   packed[n].reshape(1, -1) for n in names]

    T = TR * S
    grid = (R_pad // TR,)
    in_specs = [
        pl.BlockSpec((T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TR * 3, SEG), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TR, 3 * SEG), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    for arg in weight_args:
        in_specs.append(pl.BlockSpec(arg.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_render_kernel_pts, ncfg, S, TR)
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, GOUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad * S, GOUT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts_p, m_p, aux_p, tau_arr, *weight_args)
    return out.reshape(R_pad, S, GOUT)[:R, :, :4]


CONST_NAMES = ('F_v', 'R_v', 'F_d', 'R_d', 'R72', 'cut')


def _trainable_names(ncfg: NeRFConfig):
    return [n for n in _names(ncfg) if n not in CONST_NAMES]


def _render_kernel_pts_bwd(ncfg: NeRFConfig, S: int, TR: int,
                           bwd_f32: bool,
                           pts_ref, m_ref, aux_ref, tau_ref, g_ref, *refs,
                           stage: str = 'full'):
    """Fused backward: recompute the forward per tile (flash-style), then
    backprop through MLP, cutoff-PE, and the world->local transform in
    VMEM. Input grads (dpts/dm/daux) are per-tile block writes; weight
    grads accumulate across the sequential TPU grid into constant-index
    output blocks.

    bwd_f32 selects the cotangent-matmul operand precision: False runs
    the wide cotangent matmuls in bf16 with f32 accumulation (the
    --fast_grads numerics — VMEM-resident, so this is about MXU rate,
    not traffic); True keeps them f32 end to end (value-preserving — the
    protocol-default numerics, fused). The transform backward — the
    pose-refinement path — is f32 in both flavors.

    stage is a MEASUREMENT hook (tools/kernel_bench.py --decompose_bwd;
    production always runs 'full'): 'recompute' stops after the forward
    recompute, 'mlp' after the trunk/head backward, 'pe' after the
    cutoff-PE backward — each writes cheap digests of its live values to
    the input-grad refs (Mosaic dead-code-eliminates the rest), so stage
    differences attribute the backward's in-kernel cost.
    """
    names = _names(ncfg)
    w = _read_weights(ncfg, refs[:len(names)])
    out_refs = refs[len(names):]
    f32, bf = jnp.float32, jnp.bfloat16
    tau = tau_ref[0, 0]
    T = TR * S

    def _stop(rows=(), full=()):
        """Write cheap digests of the live values to the 3 input-grad
        refs (staged calls are built with only those outputs): `rows`
        contribute their first 3 lanes, `full` arrays a total sum — both
        force Mosaic to keep every op that produced them."""
        dpts_ref, dm_ref, daux_ref = out_refs[0], out_refs[1], out_refs[2]
        acc = jnp.zeros((T, 3), f32)
        for a in rows:
            acc += a[:T, :3].astype(f32)
        s = jnp.zeros((), f32)
        for a in full:
            s += jnp.sum(a.astype(f32))
        dpts_ref[:] = acc + s * 1e-30
        dm_ref[:] = jnp.zeros_like(dm_ref)
        daux_ref[:] = jnp.zeros_like(daux_ref)

    t = _transform_tile(S, TR, pts_ref, m_ref, aux_ref)
    fwd_out, c = _forward_trace(ncfg, w, t['v'], t['r'], t['d'], t['fc'],
                                tau, d_ray=t['d_ray'], B=t['B'])
    if stage == 'recompute':
        return _stop(rows=(fwd_out,))

    cot = f32 if bwd_f32 else bf

    def mmT(a, b):   # (T, N) x (K, N) -> (T, K), bf16 operands
        return jax.lax.dot_general(a.astype(cot), b.astype(cot),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def mmO(x, dy):  # (T, K) x (T, N) -> (K, N), bf16 operands
        return jax.lax.dot_general(x.astype(cot), dy.astype(cot),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def relu_mask(x):  # Mosaic rejects bf16 comparisons: compare in f32
        return x.astype(f32) > 0.0

    dW = {}
    g = g_ref[:]                                   # (T, GOUT), lanes 0:4
    if g.shape[-1] < LANE:
        # widen to the padded head width for the MXU dW/dh matmuls —
        # one VMEM concat instead of 67 MB of HBM lane padding per call
        g = jnp.concatenate(
            [g, jnp.zeros((g.shape[0], LANE - g.shape[-1]), g.dtype)], -1)
    hbs = c['hbs']
    hb_last = hbs[-1]

    # output heads
    dW['w_rgb'] = mmO(c['hvb'], g)
    dW['w_alpha'] = mmO(hb_last, g)
    dW['b_out'] = jnp.sum(g, 0, keepdims=True)
    dhv = mmT(g, w['w_rgb']) * relu_mask(c['hvb'])
    dW['bv'] = jnp.sum(dhv, 0, keepdims=True)

    # view layer
    dW['wv_f'] = mmO(c['featb'], dhv)
    dfeat = mmT(dhv, w['wv_f'])
    dW['wv_raw'] = mmO(c['draw'], dhv)
    ddraw = mmT(dhv, w['wv_raw'])
    dW['wv_sin'] = mmO(c['sd'], dhv)
    dsd = mmT(dhv, w['wv_sin'])
    dW['wv_cos'] = mmO(c['cd'], dhv)
    dcd = mmT(dhv, w['wv_cos'])
    dW['wv_fc'] = mmO(c['fcb'], dhv)
    dfc = mmT(dhv, w['wv_fc'])

    # feature layer + trunk
    dW['bf'] = jnp.sum(dfeat, 0, keepdims=True)
    dW['wf'] = mmO(hb_last, dfeat)
    dh = (mmT(dfeat, w['wf']) + mmT(g, w['w_alpha'])) * relu_mask(hb_last)

    NKv = w['w0_sin'].shape[0]
    dvraw = jnp.zeros((T, SEG), f32)
    dsv = jnp.zeros((T, NKv), f32)
    dcv = jnp.zeros((T, NKv), f32)
    drb = jnp.zeros((T, SEG), f32)

    for i in range(ncfg.depth - 1, 0, -1):
        dW[f'b{i}'] = jnp.sum(dh, 0, keepdims=True)
        hb_prev = hbs[i - 1]
        if (i - 1) in ncfg.skips:
            dW[f'w{i}x_raw'] = mmO(c['vraw'], dh)
            dW[f'w{i}x_sin'] = mmO(c['sv'], dh)
            dW[f'w{i}x_cos'] = mmO(c['cv'], dh)
            dW[f'w{i}x_bone'] = mmO(c['rb'], dh)
            dW[f'w{i}h'] = mmO(hb_prev, dh)
            dvraw += mmT(dh, w[f'w{i}x_raw'])
            dsv += mmT(dh, w[f'w{i}x_sin'])
            dcv += mmT(dh, w[f'w{i}x_cos'])
            drb += mmT(dh, w[f'w{i}x_bone'])
            dh = mmT(dh, w[f'w{i}h']) * relu_mask(hb_prev)
        else:
            dW[f'w{i}'] = mmO(hb_prev, dh)
            dh = mmT(dh, w[f'w{i}']) * relu_mask(hb_prev)

    dW['b0'] = jnp.sum(dh, 0, keepdims=True)
    dW['w0_raw'] = mmO(c['vraw'], dh)
    dW['w0_sin'] = mmO(c['sv'], dh)
    dW['w0_cos'] = mmO(c['cv'], dh)
    dW['w0_bone'] = mmO(c['rb'], dh)
    dvraw += mmT(dh, w['w0_raw'])
    dsv += mmT(dh, w['w0_sin'])
    dcv += mmT(dh, w['w0_cos'])
    drb += mmT(dh, w['w0_bone'])

    if stage == 'mlp':
        return _stop(rows=(dvraw, dsv, dcv, drb, dsd, dcd, ddraw, dfc),
                     full=tuple(dW.values()))

    # cutoff-PE backward (bf16 band cotangents, f32 reductions). The
    # geometry-bound dots below use the exact hi/lo splits: this is the
    # pose-refinement grad path, and F_*/R_*/G/T3 are exact in bf16.
    # (A per-ray factorization of the d-band backward — pulling the
    # constant cos/sin_ray factor out of the B^T ray-sum — measured FLAT
    # at the step level and was reverted; see PERF.md round 4.)
    dang_v = (dsv * c['cos_v'] - dcv * c['sin_v']) * c['wrep_v']
    dwrep_v = dsv * c['sin_v'] + dcv * c['cos_v']
    dang_d = (dsd * c['cos_d'] - dcd * c['sin_d']) * c['wrep_d']
    dwrep_d = dsd * c['sin_d'] + dcd * c['cos_d']
    dv = _dg_vo(dang_v, w['F_v'], ((1,), (1,)))
    dw24 = _dg_vo(dwrep_v, w['R_v'], ((1,), (1,)))
    dd = _dg_vo(dang_d, w['F_d'], ((1,), (1,)))
    dw24 += _dg_vo(dwrep_d, w['R_d'], ((1,), (1,)))
    dd += ddraw * c['w72']
    dw24 += _dg_vo(ddraw * t['d'], w['R72'], ((1,), (1,)))
    dv += dvraw * c['w24']
    dw24 += dvraw * t['v']
    # w24 = 1 - sigmoid(tau*(v - cut))
    sig = 1.0 - c['w24']
    dv += tau * dw24 * (-sig * c['w24'])

    if stage == 'pe':
        return _stop(rows=(dv, dd, drb), full=tuple(dW.values()))

    # transform backward (exact f32: the pose-refinement grad path)
    G = t['G']
    dpts_t = drb * t['vexp']
    dvexp = drb * t['pts_t']
    dvinv = _dg_vo(dvexp, G, ((1,), (0,)))         # vexp = vinv @ G.T
    dv += -dvinv * t['vinv'] * t['vinv'] * (t['v'] > 1e-12)
    dv2s = dv * 0.5 * t['vinv']                    # v = sqrt(v2s)
    dsq = _dg_vo(dv2s, G, ((1,), (1,)))            # v2s = sq @ G -> @ G.T
    dpts_t += dsq * 2.0 * t['pts_t']

    dxp3 = _dg_vv(dpts_t, t['M'], ((1,), (1,)))    # (T, TR*3)
    dM = _dg_vv(t['xp3'], dpts_t, ((0,), (0,)))    # (TR*3, SEG)
    dx3 = _dg_vo(dxp3 * t['mask'], t['T3'], ((1,), (1,)))   # (T, 3)
    daux_t = jnp.concatenate([dpts_t, dd, dfc], axis=-1)
    daux = _dg_ov(t['B'], daux_t, ((0,), (0,)))    # (TR, 3*SEG)

    dpts_ref, dm_ref, daux_ref = out_refs[0], out_refs[1], out_refs[2]
    dpts_ref[:] = dx3
    dm_ref[:] = dM
    daux_ref[:] = daux

    first = pl.program_id(0) == 0
    for name, ref in zip(_trainable_names(ncfg), out_refs[3:]):
        val = dW[name]

        @pl.when(first)
        def _init(ref=ref, val=val):
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _acc(ref=ref, val=val):
            ref[...] += val


def _fused_bwd_impl(ncfg: NeRFConfig, packed: Dict[str, Any],
                    pts: jnp.ndarray, m_all: jnp.ndarray, aux: jnp.ndarray,
                    S: int, tau, g: jnp.ndarray, bwd_f32: bool,
                    max_t: int | None = None):
    """Run the backward kernel; returns (dW dict over trainable names,
    dpts, dm_all, daux)."""
    R = pts.shape[0]
    if max_t is None:
        # the f32-cotangent flavor doubles the wide VMEM tiles; halve the
        # tile. The floor in _pick_tr means large-S configs run T=512-640
        # regardless, which is also the measured sweet spot — so small S
        # (deep culling) must not DROP below it (VERDICT r3: the fused
        # backward lost to XLA at cull 0.125 with T=256/192 tiles).
        max_t = _tile_budget(S, 'bwd_f32' if bwd_f32 else 'bwd_bf16',
                             512 if bwd_f32 else 1024)
    TR = _pick_tr(S, max_t=max_t)
    R_pad = _rup(R, TR)
    pts_p = jnp.pad(pts, ((0, R_pad - R), (0, 0), (0, 0))).reshape(
        R_pad * S, 3)
    m_p = jnp.pad(m_all, ((0, (R_pad - R) * 3), (0, 0)))
    aux_p = jnp.pad(aux, ((0, R_pad - R), (0, 0)))
    g_p = jnp.pad(g.astype(jnp.float32),
                  ((0, R_pad - R), (0, 0), (0, GOUT - g.shape[-1]))
                  ).reshape(R_pad * S, GOUT)
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1, 1)

    names = _names(ncfg)
    weight_args = [packed[n] if packed[n].ndim == 2 else
                   packed[n].reshape(1, -1) for n in names]
    arg2d = dict(zip(names, weight_args))
    trainable = _trainable_names(ncfg)

    T = TR * S
    grid = (R_pad // TR,)
    in_specs = [
        pl.BlockSpec((T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TR * 3, SEG), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TR, 3 * SEG), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((T, GOUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for arg in weight_args:
        in_specs.append(pl.BlockSpec(arg.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [
        jax.ShapeDtypeStruct((R_pad * S, 3), jnp.float32),
        jax.ShapeDtypeStruct((R_pad * 3, SEG), jnp.float32),
        jax.ShapeDtypeStruct((R_pad, 3 * SEG), jnp.float32),
    ] + [jax.ShapeDtypeStruct(arg2d[n].shape, jnp.float32)
         for n in trainable]
    out_specs = [
        pl.BlockSpec((T, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TR * 3, SEG), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TR, 3 * SEG), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(arg2d[n].shape, lambda i: (0, 0),
                      memory_space=pltpu.VMEM) for n in trainable]

    kernel = functools.partial(_render_kernel_pts_bwd, ncfg, S, TR,
                               bwd_f32)
    interpret = jax.default_backend() != 'tpu'
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts_p, m_p, aux_p, tau_arr, g_p, *weight_args)

    dpts = outs[0].reshape(R_pad, S, 3)[:R]
    dm = outs[1][:R * 3]
    daux = outs[2][:R]
    dWs = {}
    for n, o in zip(trainable, outs[3:]):
        dWs[n] = o.reshape(packed[n].shape) if packed[n].ndim == 1 else o
    return dWs, dpts, dm, daux


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_apply(ncfg: NeRFConfig, S: int, bwd_f32: bool,
                packed: Dict[str, Any],
                pts: jnp.ndarray, m_all: jnp.ndarray, aux: jnp.ndarray,
                tau) -> jnp.ndarray:
    """Differentiable fused transform+PE+MLP: (R, S, 3) world pts ->
    (R, S, 4) raw. Grads flow to the packed weights (autodiffed back
    through pack_render_params by XLA), to pts, and to m_all/aux (the
    pose-refinement path through pack_ray_data). cutoff_dist ('cut') and
    tau receive zero grads — cutoff_dist is never trained
    (train/trainer.py) and tau is a schedule. bwd_f32 selects f32
    cotangent-matmul operands in the backward kernel (value-preserving)
    vs bf16 (the --fast_grads numerics); the forward is identical."""
    return fused_encode_mlp_pts(ncfg, packed, pts, m_all, aux, S, tau)


def _fused_apply_fwd(ncfg, S, bwd_f32, packed, pts, m_all, aux, tau):
    out = fused_encode_mlp_pts(ncfg, packed, pts, m_all, aux, S, tau)
    return out, (packed, pts, m_all, aux, tau)


def _fused_apply_bwd(ncfg, S, bwd_f32, res, g):
    packed, pts, m_all, aux, tau = res
    dWs, dpts, dm, daux = _fused_bwd_impl(ncfg, packed, pts, m_all, aux,
                                          S, tau, g, bwd_f32)
    d_packed = {n: jnp.zeros_like(packed[n]) for n in CONST_NAMES}
    d_packed.update({n: v.astype(packed[n].dtype) for n, v in dWs.items()})
    dtau = jnp.zeros_like(jnp.asarray(tau, jnp.float32))
    return d_packed, dpts, dm, daux, dtau


fused_apply.defvjp(_fused_apply_fwd, _fused_apply_bwd)


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
    rays_flat = jnp.einsum('rsb,rbc->rsc', rays_d, rot_cols,
                           precision='highest')  # (R, 1, 72)
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
