"""Validate the slope microbench: is chained-kernel wall time linear in n?

tools/kernel_bench.py measures per-kernel time as the slope
(wall_N2 - wall_N1)/(N2 - N1) of a data-chained sequence of pallas calls
inside one jit. That cancels FIXED dispatch overhead, but is only valid if
wall(n) is linear — i.e. iteration cost does not itself depend on chain
length. The round-4 sweep's absolute numbers (~26 ms/iter for a forward
the XLA step trace attributes ~4.5 ms) suggest a large per-ITERATION cost
that the train step (same kernel, inside lax.scan) does not pay.

This probe times wall(n) for n in --chain_lens at one (S, max_t) point,
fits a line, and prints residuals — plus the same kernel called through
lax.scan (the train step's actual dispatch structure) for the same
iteration counts. If scan-per-iter << unrolled-per-iter, the overhead is
an artifact of UNROLLED chaining (e.g. per-call weight re-staging that
scan hoists), and the sweep's absolute columns must be read as
(true kernel ms + offset) — differences/slopes within a column stay valid.

Usage: python tools/chain_probe.py [--rays 2048] [--s 64] [--max_t 1024]
"""
import argparse
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

from tools.kernel_bench import setup, _time_min


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=2048)
    p.add_argument('--s', type=int, default=64)
    p.add_argument('--max_t', type=int, default=1024)
    p.add_argument('--reps', type=int, default=4)
    p.add_argument('--chain_lens', nargs='+', type=int,
                   default=[1, 2, 5, 10, 20, 50])
    a = p.parse_args()

    from anerf_tpu.kernels import fused_render as fr

    cfg, packed, m_all, aux, rng = setup(a.rays)
    S, max_t = a.s, a.max_t
    tau = jnp.float32(2000.0)
    pts = jnp.asarray(
        rng.normal(size=(a.rays, S, 3)).astype(np.float32) * 0.3)

    def fn_once(pp):
        return fr.fused_encode_mlp_pts(cfg.nerf, packed, pp, m_all, aux,
                                       S, tau, max_t=max_t)

    rows = []
    for n in a.chain_lens:
        def run_unrolled(pts, n=n):
            out = fn_once(pts)
            for _ in range(n - 1):
                out = fn_once(pts + out[..., :3] * 1e-6)
            return out

        def run_scan(pts, n=n):
            def body(carry, _):
                out = fn_once(carry)
                return pts + out[..., :3] * 1e-6, None
            carry, _ = jax.lax.scan(body, pts, None, length=n)
            return carry

        wall_u = _time_min(jax.jit(run_unrolled), pts, a.reps)
        wall_s = _time_min(jax.jit(run_scan), pts, a.reps)
        row = {'n': n, 'unrolled_ms': round(wall_u * 1000, 2),
               'scan_ms': round(wall_s * 1000, 2),
               'unrolled_per_iter_ms': round(wall_u / n * 1000, 3),
               'scan_per_iter_ms': round(wall_s / n * 1000, 3)}
        rows.append(row)
        print(row, flush=True)

    # two-point slopes at the ends, both structures
    if len(rows) >= 2:
        for k in ('unrolled_ms', 'scan_ms'):
            d = ((rows[-1][k] - rows[0][k])
                 / (rows[-1]['n'] - rows[0]['n']))
            print(f'slope[{k}] = {d:.3f} ms/iter', flush=True)
    print(json.dumps({'metric': 'chain_probe', 'S': S, 'max_t': max_t,
                      'rows': rows}))


if __name__ == '__main__':
    main()
