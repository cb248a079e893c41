"""On-chip numerics fidelity of both render paths vs exact-f32 oracles.

JAX on TPU runs f32 matmuls at Precision.DEFAULT as a SINGLE bf16 MXU
pass. Both render paths compute geometry through f32 matmuls:

  * XLA path: transform_batch_pts_flat / _group3_sumsq einsums
    (ops/encoding.py:47,59) — but its PE angles are ELEMENTWISE
    (ops/embedder.py), so only the transform is exposed.
  * fused kernel: transform AND the PE angle expansion are MXU dots
    (kernels/fused_render.py: pts_t, v2s, ang_v = v @ F_v, ...). A
    bf16-truncated v (rel ~4e-3) scales to 2^k*v*4e-3 ~ 0.5 rad of
    angle error at k=6, and tau=2000 sigmoid windows flip near the
    cutoff.

CPU tests run in interpret/XLA-CPU mode (exact f32) and cannot see
this. This probe measures it directly on the chip against exact-f32
CPU oracles, per tau, for:

  1. XLA path on TPU vs XLA path on CPU (raw MLP outputs + encodings)
  2. fused kernel on TPU vs its pure-jnp replica on CPU (raw outputs)
  3. fused kernel on TPU vs the XLA path on TPU (cross-path drift)
  4. optionally (--fix_xla) the XLA path on TPU under
     jax.default_matmul_precision('highest')

Usage: python tools/pe_fidelity.py [--rays 128] [--taus 35 500 2000]
"""
import argparse
import json
import os
import sys

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


class _FakeRef:
    """Array-as-ref shim so the kernel tile functions run as plain jnp."""

    def __init__(self, arr):
        self.arr = jnp.asarray(arr)

    def __getitem__(self, idx):
        return self.arr[idx]


def _err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mx = np.abs(a - b).max()
    return {'max_abs': float(round(mx, 6)),
            'rel': float(round(mx / max(np.abs(b).max(), 1e-9), 6))}


def replica_cpu(cfg, packed, pts, m_all, aux, S, tau, chunk=8):
    """Pure-jnp replica of the fused kernel tile math on CPU (exact f32)."""
    from anerf_tpu.kernels import fused_render as fr
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        packed_c = jax.device_put(packed, cpu)
        w = {n: packed_c[n] for n in fr._names(cfg.nerf)}
        outs = []
        R = pts.shape[0]
        pts_c = jax.device_put(pts, cpu)
        m_c = jax.device_put(m_all, cpu)
        aux_c = jax.device_put(aux, cpu)
        for i in range(0, R, chunk):
            t = fr._transform_tile(
                S, chunk, _FakeRef(pts_c[i:i + chunk].reshape(-1, 3)),
                _FakeRef(m_c[i * 3:(i + chunk) * 3]),
                _FakeRef(aux_c[i:i + chunk]))
            out, _ = fr._forward_trace(cfg.nerf, w, t['v'], t['r'],
                                       t['d'], t['fc'],
                                       jnp.float32(tau))
            outs.append(np.asarray(out.reshape(chunk, S, -1)[:, :, :4]))
    return np.concatenate(outs, 0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=128)
    p.add_argument('--taus', nargs='+', type=float, default=[35., 2000.])
    p.add_argument('--fix_xla', action='store_true',
                   help='also run the XLA path on TPU under '
                        "default_matmul_precision('highest')")
    a = p.parse_args()

    from tools.kernel_bench import setup
    from anerf_tpu.kernels import fused_render as fr
    from anerf_tpu.render.raycaster import encode_inputs, run_network
    from anerf_tpu.models.nerf import lookup_framecodes
    from __graft_entry__ import _flagship

    R = a.rays
    cfg, packed, m_all, aux, rng = setup(R)
    args, _, params, pose = _flagship(n_frames=32, n_rays=R, n_images=8)
    S = 64

    idx = rng.integers(0, 8, R)
    skts = jnp.asarray(pose['skts'][idx])
    kp3d = jnp.asarray(pose['kp3d'][idx])
    bones = jnp.asarray(pose['bones'][idx])
    # realistic sample points: near the posed skeleton
    centers = np.asarray(kp3d)[np.arange(R), rng.integers(0, 24, R)]
    pts = jnp.asarray(
        (centers[:, None] + rng.normal(size=(R, S, 3)) * 0.25
         ).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(R, 1, 3)).astype(np.float32))
    fc = lookup_framecodes(params['coarse'], jnp.zeros((R,), jnp.int32))
    m_all, aux = fr.pack_ray_data(rays_d, skts, fc)

    cpu = jax.devices('cpu')[0]
    tpu = jax.devices()[0]

    def xla_path(tau):
        enc = encode_inputs(cfg, pts, rays_d, kp3d, skts, bones,
                            params['cutoff_dist'], jnp.float32(tau), None)
        raw = run_network(cfg, params['coarse'], enc, fc)
        return {'enc_v': enc['v'], 'enc_d': enc['d'], 'raw': raw}

    report = []
    for tau in a.taus:
        row = {'tau': tau}
        # XLA path: TPU vs CPU
        with jax.default_device(tpu):
            x_tpu = jax.tree.map(np.asarray, jax.jit(xla_path)(tau))
        with jax.default_device(cpu):
            x_cpu = jax.tree.map(np.asarray, jax.jit(xla_path)(tau))
        for k in ('enc_v', 'enc_d', 'raw'):
            row[f'xla_{k}'] = _err(x_tpu[k], x_cpu[k])
        if a.fix_xla:
            with jax.default_matmul_precision('highest'):
                with jax.default_device(tpu):
                    x_fix = jax.tree.map(np.asarray, jax.jit(xla_path)(tau))
            for k in ('enc_v', 'enc_d', 'raw'):
                row[f'xlafix_{k}'] = _err(x_fix[k], x_cpu[k])
        # fused kernel: TPU vs CPU replica (exact same math, exact f32)
        f_tpu = np.asarray(fr.fused_encode_mlp_pts(
            cfg.nerf, packed, pts, m_all, aux, S, jnp.float32(tau)))
        f_cpu = replica_cpu(cfg, packed, pts, m_all, aux, S, tau)
        row['fused_raw_vs_replica'] = _err(f_tpu, f_cpu)
        # cross-path drift on chip
        row['fused_vs_xla_tpu'] = _err(f_tpu, x_tpu['raw'])
        row['fused_cpu_replica_vs_xla_cpu'] = _err(f_cpu, x_cpu['raw'])
        report.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({'metric': 'pe_fidelity', 'rays': R, 'S': S,
                      'rows': report}))


if __name__ == '__main__':
    main()
