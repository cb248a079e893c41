"""Pallas TPU kernel: cutoff-PE encoding + full NeRF MLP in one pass.

The flagship-path fusion (SURVEY §7 design delta 2). The XLA pipeline
materializes the 360-wide kp PE and 648-wide view PE in HBM between the
encode and MLP stages (reference analog: encode_inputs -> run_network,
core/raycasters.py:476-577). This kernel takes only the RAW skeleton-
relative quantities per point —

    x = [ j_dists(24) | j_dists_rep3(72) | bone_dirs(72) | view_dirs(72)
          | framecode(16) ]  = 256 f32 lanes

— computes the cutoff windows `w = 1 - sigmoid(tau (d - cutoff))`, the
sin/cos bands, and the whole 8x256 MLP with weights resident in VMEM,
writing just (P, 4) raw outputs. HBM traffic per point drops from ~4.6 KB
(padded PE + per-layer activations) to ~1.1 KB.

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
from .fused_mlp import LANE, _rup, _weight_names, pack_params

N_JOINTS = 24
IN_WIDTH = 256  # 24 + 72 + 72 + 72 + 16


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


def _encode_kernel(ncfg: NeRFConfig, n_freq_kp: int, n_freq_view: int,
                   x_ref, cut_ref, tau_ref, *refs):
    """One tile: raw inputs (T, 256) -> raw outputs (T, 128)."""
    names = _weight_names(ncfg)
    w = {}
    for name, ref in zip(names, refs[:-1]):
        arr = ref[:]
        if name.startswith('b'):
            arr = arr.reshape(-1)
        w[name] = arr
    out_ref = refs[-1]

    f32 = jnp.float32
    x = x_ref[:]
    v = x[:, :24]                  # per-joint distances
    vrep = x[:, 24:96]             # distances repeated x3 (joint-major)
    r = x[:, 96:168]               # bone dirs (identity PE)
    d = x[:, 168:240]              # view dirs
    fc = x[:, 240:256]             # framecode (zeros when unused)

    tau = tau_ref[0, 0]
    cut24 = cut_ref[0, :24]
    cut72 = cut_ref[0, 24:96]

    # cutoff windows (cutoff_embedder.py:139-145)
    w24 = 1.0 - jax.nn.sigmoid(tau * (v - cut24))
    w72 = 1.0 - jax.nn.sigmoid(tau * (vrep - cut72))

    # kp encoding: [v, sin(f0 v), cos(f0 v), ...] * w  (cutoff_inputs mode)
    kp_parts = [v * w24]
    for k in range(n_freq_kp):
        fv = v * (2.0 ** k)
        kp_parts.append(jnp.sin(fv) * w24)
        kp_parts.append(jnp.cos(fv) * w24)
    kp_parts.append(r)             # bone block, identity PE
    xp = jnp.concatenate(kp_parts, axis=-1).astype(jnp.bfloat16)

    # view encoding: [d, sin(f0 d), cos(f0 d), ...] * w72 + framecode
    vw_parts = [d * w72]
    for k in range(n_freq_view):
        fd = d * (2.0 ** k)
        vw_parts.append(jnp.sin(fd) * w72)
        vw_parts.append(jnp.cos(fd) * w72)
    vw_parts.append(fc)
    xv = jnp.concatenate(vw_parts, axis=-1).astype(jnp.bfloat16)

    # ---- MLP (same math as kernels/fused_mlp.py) ----
    dnet = ncfg.dnet_input
    h = jnp.dot(xp, w['w0'][:dnet], preferred_element_type=f32) + w['b0']
    h = jnp.maximum(h, 0.0)
    for i in range(1, ncfg.depth):
        hb = h.astype(jnp.bfloat16)
        if (i - 1) in ncfg.skips:
            acc = jnp.dot(xp, w[f'w{i}x'][:dnet],
                          preferred_element_type=f32)
            acc += jnp.dot(hb, w[f'w{i}h'], preferred_element_type=f32)
        else:
            acc = jnp.dot(hb, w[f'w{i}'], preferred_element_type=f32)
        h = jnp.maximum(acc + w[f'b{i}'], 0.0)

    hb = h.astype(jnp.bfloat16)
    feat = jnp.dot(hb, w['wf'], preferred_element_type=f32) + w['bf']
    view_in = ncfg.input_ch_views + (ncfg.framecode_ch if ncfg.use_framecode
                                     else 0)
    hv = jnp.dot(feat.astype(jnp.bfloat16), w['wv_f'],
                 preferred_element_type=f32)
    hv += jnp.dot(xv, w['wv_d'][:view_in], preferred_element_type=f32)
    hv = jnp.maximum(hv + w['bv'], 0.0)

    out = jnp.dot(hv.astype(jnp.bfloat16), w['w_rgb'],
                  preferred_element_type=f32)
    out += jnp.dot(hb, w['w_alpha'], preferred_element_type=f32)
    out_ref[:] = out + w['b_out']


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 6))
def fused_encode_mlp(ncfg: NeRFConfig, n_freq_kp: int, n_freq_view: int,
                     packed: Dict[str, Any], x_raw: jnp.ndarray,
                     cut_tau: jnp.ndarray, tile: int = 512) -> jnp.ndarray:
    """x_raw (P, 256) f32 raw inputs -> raw (P, 4).

    cut_tau: (1, 128) f32 = [cutoff24 | cutoff_rep3(72) | tau | pad].
    """
    P = x_raw.shape[0]
    P_pad = _rup(P, tile)
    x = jnp.pad(x_raw, ((0, P_pad - P), (0, 0)))

    tau = cut_tau[:, 96:97]                   # (1, 1) scalar for SMEM

    names = _weight_names(ncfg)
    weight_args = [packed[n] if packed[n].ndim == 2 else
                   packed[n].reshape(1, -1) for n in names]

    grid = (P_pad // tile,)
    in_specs = [
        pl.BlockSpec((tile, IN_WIDTH), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    for arg in weight_args:
        in_specs.append(pl.BlockSpec(arg.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_encode_kernel, ncfg, n_freq_kp, n_freq_view)
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x, cut_tau, tau, *weight_args)
    return out[:P, :4]


def build_raw_inputs(pts_t: jnp.ndarray, rays_t: jnp.ndarray,
                     framecodes: jnp.ndarray | None) -> jnp.ndarray:
    """Assemble the (R, S, 256) raw kernel input from local-frame points.

    pts_t (R, S, J, 3), rays_t (R, 1, J, 3), framecodes (R, fc) or None.
    Cheap XLA elementwise work; everything wide stays in the kernel.
    """
    R, S = pts_t.shape[:2]
    v = jnp.linalg.norm(pts_t, axis=-1)                        # (R, S, 24)
    vrep = jnp.repeat(v, 3, axis=-1)                           # (R, S, 72)
    r = pts_t / jnp.maximum(
        jnp.linalg.norm(pts_t, axis=-1, keepdims=True), 1e-12)
    r = r.reshape(R, S, 72)
    d = rays_t / jnp.maximum(
        jnp.linalg.norm(rays_t, axis=-1, keepdims=True), 1e-12)
    d = jnp.broadcast_to(d.reshape(R, 1, 72), (R, S, 72))
    if framecodes is not None:
        fc = jnp.broadcast_to(framecodes[:, None],
                              (R, S, framecodes.shape[-1]))
    else:
        fc = jnp.zeros((R, S, 16), v.dtype)
    pad = jnp.zeros((R, S, IN_WIDTH - 240 - fc.shape[-1]), v.dtype)
    return jnp.concatenate([v, vrep, r, d, fc, pad], axis=-1)


def build_cut_tau(cutoff_dist: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """(1, 128) constant block: [cutoff24 | cutoff_rep3 | tau | 0...]."""
    cut24 = cutoff_dist.reshape(-1)[:24]
    cut72 = jnp.repeat(cut24, 3)
    row = jnp.zeros((LANE,), jnp.float32)
    row = row.at[:24].set(cut24)
    row = row.at[24:96].set(cut72)
    row = row.at[96].set(jnp.asarray(tau, jnp.float32))
    return row.reshape(1, LANE)
