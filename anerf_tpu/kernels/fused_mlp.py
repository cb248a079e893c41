"""Pallas TPU kernel: the full NeRF MLP fused into one VMEM-resident pass.

Replaces the XLA lowering of the 8x256 trunk + heads
(models/nerf.py:apply_nerf) for the hot render path. Under XLA each Dense
layer writes its (P, 256) activation to HBM; with ~10 layer tensors that is
>1.5 GB of HBM traffic per 295k-point batch — 3x the cost of the matmul
FLOPs. This kernel keeps ALL weights (~0.6 M params, bf16) and the per-tile
activations in VMEM: HBM traffic collapses to the kernel inputs and the
(P, 4) outputs.

Weights are packed once per call tree by `pack_params` into padded bf16
matrices:
  * trunk layer i: (in_i, 256) where in_i = dnet_in (layer 0), 256, or
    256 + dnet_in at the skip.
  * heads merged into two matmuls: out = hv @ Wrgb_pad + h @ Walpha_pad
    writing [rgb(3), alpha(1)] into the first 4 lanes of a 128-wide block.

Kernel math matches models/nerf.py exactly (bf16 MXU matmuls, f32
accumulation via the f32 bias add).
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

LANE = 128


def _pad_to(x: np.ndarray | jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    x = jnp.asarray(x)
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _rup(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


def pack_params(params: Dict[str, Any], cfg: NeRFConfig) -> Dict[str, Any]:
    """Pad + cast one network's params for the kernel. Shapes are static
    given cfg, so this traces into the surrounding jit."""
    W = cfg.width
    dnet = cfg.dnet_input
    dnet_p = _rup(dnet)
    view_in = cfg.input_ch_views + (cfg.framecode_ch if cfg.use_framecode
                                    else 0)
    view_p = _rup(view_in)

    packed = {}
    tl = params['pts_linears']
    # layer 0: (dnet_p, W)
    packed['w0'] = _pad_to(tl[0]['w'], dnet_p, W).astype(jnp.bfloat16)
    packed['b0'] = jnp.asarray(tl[0]['b'], jnp.float32)
    for i in range(1, cfg.depth):
        w = tl[i]['w']
        if (i - 1) in cfg.skips:
            # input was cat([x, h]): split into x-part and h-part
            packed[f'w{i}x'] = _pad_to(w[:dnet], dnet_p, W).astype(
                jnp.bfloat16)
            packed[f'w{i}h'] = jnp.asarray(w[dnet:], jnp.bfloat16)
        else:
            packed[f'w{i}'] = jnp.asarray(w, jnp.bfloat16)
        packed[f'b{i}'] = jnp.asarray(tl[i]['b'], jnp.float32)

    packed['wf'] = jnp.asarray(params['feature_linear']['w'], jnp.bfloat16)
    packed['bf'] = jnp.asarray(params['feature_linear']['b'], jnp.float32)

    vl = params['views_linears'][0]
    # views layer input = cat([feature(W), views(view_in)])
    packed['wv_f'] = jnp.asarray(vl['w'][:W], jnp.bfloat16)
    packed['wv_d'] = _pad_to(vl['w'][W:], view_p, W // 2).astype(jnp.bfloat16)
    packed['bv'] = jnp.asarray(vl['b'], jnp.float32)

    # merged output: [rgb(3) | alpha(1)] in the first 4 of 128 lanes
    wr = params['rgb_linear']['w']            # (W//2, 3)
    wa = params['alpha_linear']['w']          # (W, 1)
    packed['w_rgb'] = _pad_to(wr, W // 2, LANE).astype(jnp.bfloat16)
    wa_pad = jnp.zeros((W, LANE), jnp.float32).at[:, 3:4].set(
        jnp.asarray(wa))
    packed['w_alpha'] = wa_pad.astype(jnp.bfloat16)
    b_out = jnp.zeros((LANE,), jnp.float32)
    b_out = b_out.at[:3].set(jnp.asarray(params['rgb_linear']['b']))
    b_out = b_out.at[3].set(jnp.asarray(params['alpha_linear']['b'])[0])
    packed['b_out'] = b_out
    return packed


def _weight_names(cfg: NeRFConfig):
    names = ['w0', 'b0']
    for i in range(1, cfg.depth):
        if (i - 1) in cfg.skips:
            names += [f'w{i}x', f'w{i}h', f'b{i}']
        else:
            names += [f'w{i}', f'b{i}']
    names += ['wf', 'bf', 'wv_f', 'wv_d', 'bv', 'w_rgb', 'w_alpha', 'b_out']
    return names


@functools.partial(jax.jit, static_argnums=(0, 4))
def fused_mlp_apply(cfg: NeRFConfig, packed: Dict[str, Any],
                    x_pts: jnp.ndarray, x_view: jnp.ndarray,
                    tile: int = 256) -> jnp.ndarray:
    """Apply the fused MLP to flat points.

    x_pts: (P, dnet_input) f32/bf16 density input (already embedded).
    x_view: (P, view_in) view input (embedded dirs [+ framecode]).
    Returns raw (P, 4) f32 = [rgb_logits, sigma].
    """
    P = x_pts.shape[0]
    dnet_p = _rup(cfg.dnet_input)
    view_in = cfg.input_ch_views + (cfg.framecode_ch if cfg.use_framecode
                                    else 0)
    view_p = _rup(view_in)

    P_pad = _rup(P, tile)
    xp = jnp.zeros((P_pad, dnet_p), jnp.bfloat16)
    xp = xp.at[:P, :cfg.dnet_input].set(x_pts.astype(jnp.bfloat16))
    xv = jnp.zeros((P_pad, view_p), jnp.bfloat16)
    xv = xv.at[:P, :view_in].set(x_view.astype(jnp.bfloat16))

    names = _weight_names(cfg)
    weight_args = [packed[n] if packed[n].ndim == 2 else
                   packed[n].reshape(1, -1) for n in names]

    grid = (P_pad // tile,)
    in_specs = [
        pl.BlockSpec((tile, dnet_p), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, view_p), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for arg in weight_args:
        in_specs.append(pl.BlockSpec(arg.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel_entry, cfg)
    # interpret mode off-TPU so tests run on the CPU mesh
    interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, LANE), jnp.float32),
        interpret=interpret,
    )(xp, xv, *weight_args)
    return out[:P, :4]


def _mlp_chain(cfg, w, xp, xv):
    """The serial layer chain on one row block (bf16 MXU, f32 accum)."""
    f32 = jnp.float32
    h = jnp.dot(xp, w['w0'], preferred_element_type=f32) + w['b0']
    h = jnp.maximum(h, 0.0)
    for i in range(1, cfg.depth):
        hb = h.astype(jnp.bfloat16)
        if (i - 1) in cfg.skips:
            acc = jnp.dot(xp, w[f'w{i}x'], preferred_element_type=f32)
            acc += jnp.dot(hb, w[f'w{i}h'], preferred_element_type=f32)
        else:
            acc = jnp.dot(hb, w[f'w{i}'], preferred_element_type=f32)
        h = jnp.maximum(acc + w[f'b{i}'], 0.0)

    hb = h.astype(jnp.bfloat16)
    feat = jnp.dot(hb, w['wf'], preferred_element_type=f32) + w['bf']
    hv = jnp.dot(feat.astype(jnp.bfloat16), w['wv_f'],
                 preferred_element_type=f32)
    hv += jnp.dot(xv, w['wv_d'], preferred_element_type=f32)
    hv = jnp.maximum(hv + w['bv'], 0.0)

    out = jnp.dot(hv.astype(jnp.bfloat16), w['w_rgb'],
                  preferred_element_type=f32)
    out += jnp.dot(hb, w['w_alpha'], preferred_element_type=f32)
    return out + w['b_out']


# independent row half-blocks computed per tile: the two dependency chains
# give the Mosaic scheduler freedom to overlap one block's VPU epilogue
# (bias+relu+cast) with the other block's MXU matmul
N_INTERLEAVE = 2


def _kernel_entry(cfg, xp_ref, xv_ref, *refs):
    names = _weight_names(cfg)
    w = {}
    for name, ref in zip(names, refs[:-1]):
        arr = ref[:]
        if name.startswith('b'):
            arr = arr.reshape(-1)
        w[name] = arr
    out_ref = refs[-1]

    tile = xp_ref.shape[0]
    if tile % N_INTERLEAVE == 0 and tile >= 2 * 128:
        half = tile // N_INTERLEAVE
        for k in range(N_INTERLEAVE):
            sl = slice(k * half, (k + 1) * half)
            out_ref[sl, :] = _mlp_chain(cfg, w, xp_ref[sl, :], xv_ref[sl, :])
    else:
        out_ref[:] = _mlp_chain(cfg, w, xp_ref[:], xv_ref[:])


def supports_config(cfg: NeRFConfig) -> bool:
    """The kernel covers the standard architecture family: viewdir head,
    any depth/width multiple of 128, one skip."""
    return (cfg.use_viewdirs
            and cfg.width % LANE == 0
            and (cfg.width // 2) % LANE == 0
            and cfg.depth >= 2)
