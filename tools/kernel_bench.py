"""Isolated fused-kernel timings over tile-size / precision variants.

Times fused_encode_mlp_pts (forward) and _fused_bwd_impl (backward) at
the flagship model size for the shapes the train step actually dispatches
(strict: S=64 coarse + S=80 fine; cull 0.125: S=8 + S=24), across max_t
tile budgets. Drives the VERDICT r4 #1 tile-shape decision with direct
evidence instead of full-step A/Bs.

Usage: python tools/kernel_bench.py [--rays 2048] [--reps 8]
"""
import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from anerf_tpu.utils.device_lock import acquire, wait_until_live

acquire()
_err = wait_until_live()
if _err is not None:
    sys.exit(f'[{__file__}] {_err}')

import jax
import jax.numpy as jnp


def setup(n_rays):
    from __graft_entry__ import _flagship
    from anerf_tpu.kernels.fused_render import (pack_ray_data,
                                                pack_render_params)
    from anerf_tpu.models.nerf import lookup_framecodes

    args, cfg, params, pose = _flagship(n_frames=32, n_rays=n_rays,
                                        n_images=8)
    packed = pack_render_params(params['coarse'], cfg.nerf,
                                cfg.embed_kp.num_freqs,
                                cfg.embed_view.num_freqs,
                                params['cutoff_dist'])
    rng = np.random.default_rng(0)
    skts = jnp.asarray(pose['skts'][rng.integers(0, 8, n_rays)])
    rays_d = jnp.asarray(rng.normal(size=(n_rays, 1, 3)).astype(np.float32))
    fc = lookup_framecodes(params['coarse'],
                           jnp.zeros((n_rays,), jnp.int32))
    m_all, aux = pack_ray_data(rays_d, skts, fc)
    return cfg, packed, m_all, aux, rng


#: The axon tunnel costs ~25 ms per dispatch round trip — far more than
#: the 1-5 ms kernels being measured — so each timed dispatch chains N
#: data-dependent kernel calls inside one jit, at TWO chain lengths, and
#: the per-iteration time is the slope (wall_N2 - wall_N1)/(N2 - N1):
#: fixed per-dispatch overhead cancels exactly.
ITERS = tuple(int(x) for x in
              os.environ.get('KB_ITERS', '10,50').split(','))


def chain_fwd(fn_once, n):
    """fn_once(pts) -> out (R, S, 4). Returns jit(pts) running n
    data-chained calls (each input perturbed by the previous output so
    XLA cannot CSE or elide any iteration)."""
    def run(pts):
        out = fn_once(pts)
        for _ in range(n - 1):
            out = fn_once(pts + out[..., :3] * 1e-6)
        return out
    return jax.jit(run)


def chain_bwd(fn_once, n):
    """fn_once(pts) -> (dWs, dpts, dm, daux); chains through dpts."""
    def run(pts):
        outs = fn_once(pts)
        for _ in range(n - 1):
            outs = fn_once(pts + outs[1] * 1e-6)
        return outs[1]
    return jax.jit(run)


def _time_min(fn, pts, reps):
    out = fn(pts)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(pts)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_call(chain, fn_once, pts, pts2, reps=8):
    """Per-iteration seconds via the two-chain-length slope; min over two
    distinct inputs (tunnel memoization hygiene)."""
    n1, n2 = ITERS
    f1, f2 = chain(fn_once, n1), chain(fn_once, n2)
    per_iter = []
    for p in (pts, pts2):
        t1, t2 = _time_min(f1, p, reps), _time_min(f2, p, reps)
        per_iter.append((t2 - t1) / (n2 - n1))
    return min(per_iter)


def decompose(cfg, packed, m_all, aux, rng, R, shapes, reps):
    """Time stripped-down FORWARD kernel variants to attribute in-kernel
    cost: world->local transform only; transform + cutoff-PE; full
    (transform + PE + MLP). Differences give the per-stage cost — the
    evidence base for where the fused kernel's non-MXU time goes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from anerf_tpu.kernels import fused_render as fr
    from anerf_tpu.kernels.fused_mlp import LANE, _rup

    names = fr._names(cfg.nerf)

    def make_variant(stage, S, TR):
        def kernel(pts_ref, m_ref, aux_ref, tau_ref, *refs):
            w = fr._read_weights(cfg.nerf, refs[:-1])
            out_ref = refs[-1]
            if stage == 'split2':
                # full forward as TWO INDEPENDENT half-tiles: if Mosaic
                # co-schedules the VPU-bound PE of one half against the
                # MXU-bound MLP of the other, split2 < full at equal rows
                half_t, half_r = (TR // 2) * S, TR // 2
                pts, m, aux = pts_ref[:], m_ref[:], aux_ref[:]
                for h in range(2):
                    t = fr._transform_tile(
                        S, half_r, pts[h * half_t:(h + 1) * half_t],
                        m[h * half_r * 3:(h + 1) * half_r * 3],
                        aux[h * half_r:(h + 1) * half_r])
                    out_ref[h * half_t:(h + 1) * half_t] = fr._pe_mlp_body(
                        cfg.nerf, w, t['v'], t['r'], t['d'], t['fc'],
                        tau_ref[0, 0], d_ray=t['d_ray'], B=t['B'])
                return
            t = fr._transform_tile(S, TR, pts_ref, m_ref, aux_ref)
            if stage == 'transform':
                out_ref[:] = (t['v'][:, :LANE] + t['r'][:, :LANE]
                              + t['d'][:, :LANE])
                return
            # 'pe'/'pe_notrig' run the per-POINT view-trig path (the
            # pre-round-4 design) so trig_ms measures what the per-ray
            # redesign removes; 'pe_perray'/'full'/'split2' run the
            # production per-ray path
            perray = stage in ('pe_perray', 'full', 'split2')
            out, c = fr._forward_trace(
                cfg.nerf, w, t['v'], t['r'], t['d'], t['fc'],
                tau_ref[0, 0],
                d_ray=t['d_ray'] if perray else None,
                B=t['B'] if perray else None)
            if stage in ('pe', 'pe_notrig', 'pe_perray'):
                # consume every PE band via cheap reductions so Mosaic
                # cannot dead-code-eliminate the trig (the MLP part of
                # _forward_trace IS dead here and gets eliminated)
                acc = jnp.zeros((pts_ref.shape[0], 1), jnp.float32)
                for k in ('sv', 'cv', 'sd', 'cd', 'vraw', 'draw'):
                    acc += jnp.sum(c[k].astype(jnp.float32), -1,
                                   keepdims=True)
                out_ref[:] = jnp.broadcast_to(acc, out_ref.shape)
            else:
                out_ref[:] = out

        T = TR * S
        R_pad = _rup(R, TR)
        m_p = jnp.pad(m_all, ((0, (R_pad - R) * 3), (0, 0)))
        aux_p = jnp.pad(aux, ((0, R_pad - R), (0, 0)))
        weight_args = [packed[n] if packed[n].ndim == 2 else
                       packed[n].reshape(1, -1) for n in names]

        def call(pts):
            pts_p = jnp.pad(pts, ((0, R_pad - R), (0, 0), (0, 0))
                            ).reshape(R_pad * S, 3)
            tau_arr = jnp.asarray(2000.0, jnp.float32).reshape(1, 1)
            in_specs = [
                pl.BlockSpec((T, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR * 3, fr.SEG), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, 3 * fr.SEG), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [pl.BlockSpec(a.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
                 for a in weight_args]
            out = pl.pallas_call(
                kernel,
                grid=(R_pad // TR,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((T, LANE), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R_pad * S, LANE),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=jax.default_backend() != 'tpu',
            )(pts_p, m_p, aux_p, tau_arr, *weight_args)
            return out.reshape(R_pad, S, LANE)[:R, :, :4]
        return call

    results = []
    for S in shapes:
        from anerf_tpu.kernels.fused_render import _pick_tr
        TR = _pick_tr(S, 1024)
        pts = jnp.asarray(rng.normal(size=(R, S, 3)).astype(np.float32)
                          * 0.3)
        pts2 = pts + 0.01
        row = {'S': S, 'TR': TR}
        # _SINCOS swaps per stage: 'pe_notrig' = near-free stand-in (the
        # pe - pe_notrig difference is ALL trig cost), 'pe_libtrig' =
        # jnp.sin/jnp.cos (pe_libtrig - pe = what _fast_sincos saves);
        # all other stages run the production _fast_sincos.
        _SWAPS = {
            'pe_notrig': lambda x: (x * 0.5 - x * x * 0.124,
                                    1.0 - x * x * 0.437),
            'pe_libtrig': lambda x: (jnp.sin(x), jnp.cos(x)),
        }
        for stage in ('transform', 'pe', 'pe_notrig', 'pe_libtrig',
                      'pe_perray', 'full', 'split2'):
            saved = fr._SINCOS
            if stage in _SWAPS:
                fr._SINCOS = _SWAPS[stage]
            try:
                fn = make_variant(stage, S, TR)
                dt = time_call(chain_fwd, fn, pts, pts2, reps=reps)
            finally:
                fr._SINCOS = saved
            row[stage + '_ms'] = round(dt * 1000, 3)
        row['pe_only_ms'] = round(row['pe_ms'] - row['transform_ms'], 3)
        row['trig_ms'] = round(row['pe_ms'] - row['pe_notrig_ms'], 3)
        row['libtrig_extra_ms'] = round(row['pe_libtrig_ms']
                                        - row['pe_ms'], 3)
        row['perray_gain_ms'] = round(row['pe_ms'] - row['pe_perray_ms'], 3)
        row['mlp_only_ms'] = round(row['full_ms'] - row['pe_perray_ms'], 3)
        row['overlap_gain_ms'] = round(row['full_ms'] - row['split2_ms'], 3)
        results.append(row)
        print(row, flush=True)
    print(json.dumps({'metric': 'kernel_decompose', 'rows': results}))


def decompose_bwd(cfg, packed, m_all, aux, rng, R, shapes, reps,
                  bwd_f32=True):
    """Attribute the BACKWARD kernel's in-kernel cost via the kernel's
    staged early exits (fused_render._render_kernel_pts_bwd stage=):
    forward recompute / + MLP backward (incl. dW outer products) /
    + cutoff-PE backward / full (+ transform backward, production)."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from anerf_tpu.kernels import fused_render as fr
    from anerf_tpu.kernels.fused_mlp import LANE, _rup

    names = fr._names(cfg.nerf)
    SEG = fr.SEG

    def make_staged(stage, S, TR):
        weight_args = [packed[n] if packed[n].ndim == 2 else
                       packed[n].reshape(1, -1) for n in names]
        T = TR * S

        def call(pts, g):
            R_ = pts.shape[0]
            R_pad = _rup(R_, TR)
            pts_p = jnp.pad(pts, ((0, R_pad - R_), (0, 0), (0, 0))
                            ).reshape(R_pad * S, 3)
            m_p = jnp.pad(m_all, ((0, (R_pad - R_) * 3), (0, 0)))
            aux_p = jnp.pad(aux, ((0, R_pad - R_), (0, 0)))
            g_p = jnp.pad(g.astype(jnp.float32),
                          ((0, R_pad - R_), (0, 0),
                           (0, LANE - g.shape[-1]))).reshape(R_pad * S,
                                                             LANE)
            tau_arr = jnp.full((1, 1), 2000.0, jnp.float32)
            in_specs = [
                pl.BlockSpec((T, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR * 3, SEG), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, 3 * SEG), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((T, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec(arg.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
                 for arg in weight_args]
            out_shapes = [
                jax.ShapeDtypeStruct((R_pad * S, 3), jnp.float32),
                jax.ShapeDtypeStruct((R_pad * 3, SEG), jnp.float32),
                jax.ShapeDtypeStruct((R_pad, 3 * SEG), jnp.float32),
            ]
            out_specs = [
                pl.BlockSpec((T, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR * 3, SEG), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, 3 * SEG), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            kernel = functools.partial(fr._render_kernel_pts_bwd,
                                       cfg.nerf, S, TR, bwd_f32,
                                       stage=stage)
            outs = pl.pallas_call(
                kernel,
                grid=(R_pad // TR,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=jax.default_backend() != 'tpu',
            )(pts_p, m_p, aux_p, tau_arr, g_p, *weight_args)
            return outs[0].reshape(R_pad, S, 3)[:R_]
        return call

    results = []
    for S in shapes:
        TR = fr._pick_tr(S, 512 if bwd_f32 else 1024)
        pts = jnp.asarray(rng.normal(size=(R, S, 3)).astype(np.float32)
                          * 0.3)
        g = jnp.asarray(rng.normal(size=(R, S, 4)).astype(np.float32))
        pts2 = pts + 0.01
        row = {'S': S, 'TR': TR, 'bwd_f32': bwd_f32}
        for stage in ('recompute', 'mlp', 'pe', 'full'):
            if stage == 'full':
                fn = (lambda pp, S=S: fr._fused_bwd_impl(
                    cfg.nerf, packed, pp, m_all, aux, S,
                    jnp.float32(2000.0), g, bwd_f32))
                dt = time_call(chain_bwd, fn, pts, pts2, reps=reps)
            else:
                staged = make_staged(stage, S, TR)
                fn = lambda pp, _s=staged: _s(pp, g)

                def chain_staged(fn_once, n):
                    def run(pp):
                        out = fn_once(pp)
                        for _ in range(n - 1):
                            out = fn_once(pp + out * 1e-6)
                        return out
                    return jax.jit(run)
                dt = time_call(chain_staged, fn, pts, pts2, reps=reps)
            row[stage + '_ms'] = round(dt * 1000, 3)
        row['mlp_bwd_ms'] = round(row['mlp_ms'] - row['recompute_ms'], 3)
        row['pe_bwd_ms'] = round(row['pe_ms'] - row['mlp_ms'], 3)
        row['transform_bwd_ms'] = round(row['full_ms'] - row['pe_ms'], 3)
        results.append(row)
        print(row, flush=True)
    print(json.dumps({'metric': 'kernel_decompose_bwd', 'rows': results}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=2048)
    p.add_argument('--reps', type=int, default=8)
    p.add_argument('--shapes', nargs='+', type=int, default=[64, 80, 8, 24])
    p.add_argument('--max_ts', nargs='+', type=int,
                   default=[256, 512, 1024, 2048])
    p.add_argument('--decompose', action='store_true',
                   help='attribute in-kernel forward cost: transform / '
                        'cutoff-PE / MLP stage timings per shape')
    p.add_argument('--decompose_bwd', action='store_true',
                   help='attribute in-kernel BACKWARD cost: forward '
                        'recompute / MLP bwd / PE bwd / transform bwd')
    p.add_argument('--bwd_bf16', action='store_true',
                   help='decompose_bwd: time the bf16-cotangent flavor')
    a = p.parse_args()

    from anerf_tpu.kernels import fused_render as fr

    cfg, packed, m_all, aux, rng = setup(a.rays)
    R = a.rays
    if a.decompose:
        return decompose(cfg, packed, m_all, aux, rng, R, a.shapes, a.reps)
    if a.decompose_bwd:
        return decompose_bwd(cfg, packed, m_all, aux, rng, R, a.shapes,
                             a.reps, bwd_f32=not a.bwd_bf16)
    tau = jnp.float32(2000.0)
    results = []

    for S in a.shapes:
        pts = jnp.asarray(
            rng.normal(size=(R, S, 3)).astype(np.float32) * 0.3)
        g = jnp.asarray(rng.normal(size=(R, S, 4)).astype(np.float32))
        pts2 = pts + 0.01  # alternate input (tunnel memoization hygiene)

        for max_t in a.max_ts:
            if max_t // S < 1 and S > max_t:
                continue
            fn_fwd = (lambda pp, S=S, max_t=max_t: fr.fused_encode_mlp_pts(
                cfg.nerf, packed, pp, m_all, aux, S, tau, max_t=max_t))
            try:
                dt = time_call(chain_fwd, fn_fwd, pts, pts2, reps=a.reps)
                row = {'kind': 'fwd', 'S': S, 'max_t': max_t,
                       'TR': fr._pick_tr(S, max_t),
                       'ms': round(dt * 1000, 3)}
                results.append(row)
                print(row, flush=True)
            except Exception as e:
                print({'kind': 'fwd', 'S': S, 'max_t': max_t,
                       'error': str(e)[:100]}, flush=True)
            # backward, both cotangent flavors
            for bwd_f32 in (True, False):
                fn_bwd = (
                    lambda pp, S=S, max_t=max_t, bwd_f32=bwd_f32:
                    fr._fused_bwd_impl(cfg.nerf, packed, pp, m_all, aux, S,
                                       tau, g, bwd_f32, max_t=max_t))
                try:
                    dt = time_call(chain_bwd, fn_bwd, pts, pts2,
                                   reps=a.reps)
                    row = {'kind': f'bwd_{"f32" if bwd_f32 else "bf16"}',
                           'S': S, 'max_t': max_t,
                           'TR': fr._pick_tr(S, max_t),
                           'ms': round(dt * 1000, 3)}
                    results.append(row)
                    print(row, flush=True)
                except Exception as e:
                    print({'kind': f'bwd_{"f32" if bwd_f32 else "bf16"}',
                           'S': S, 'max_t': max_t,
                           'error': str(e)[:100]}, flush=True)

    print(json.dumps({'metric': 'kernel_bench', 'rows': results}))


if __name__ == '__main__':
    main()
