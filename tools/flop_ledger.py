"""Strict-protocol FLOP ledger (VERDICT r4 next-round #3).

Compiles the requested train-step flavor (bench.build; strict = the
reference surreal.txt recipe shapes, N_rand 2048, 64+16 samples —
`/root/reference/configs/surreal/surreal.txt:28-38`) on the CPU backend
and reads XLA's cost analysis off the compiled executable, plus an
analytic matmul count from the actual parameter shapes. Output is the
arithmetic behind the "strict is compute-bound" ceiling argument
(PERF.md "strict ceiling"): FLOPs per optimizer step / per ray, and the
implied achieved FLOP/s at a measured rays/s vs the v5e bf16 MXU peak.

XLA counts a `lax.scan` body ONCE regardless of trip count (verified by
the inline probe below), so the lowered 20-step dispatch's cost IS the
per-optimizer-step cost.

CPU-only (cost analysis is shape math; no device touch).  Usage:
    python tools/flop_ledger.py [--rays_per_s 82200] [--flavor strict]
"""
import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12   # v5e MXU peak (PERF.md round-4 attribution)


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    return c[0] if isinstance(c, list) else c


def _assert_scan_counted_once():
    """Guard the core assumption against jax version drift."""
    def body(c, _):
        return c @ c, None

    def f5(x):
        return lax.scan(body, x, None, length=5)[0]

    def f20(x):
        return lax.scan(body, x, None, length=20)[0]

    x = jnp.ones((64, 64))
    assert _cost(f5, x)['flops'] == _cost(f20, x)['flops'], \
        'cost_analysis now multiplies scan trip count — fix the ledger'


def _mlp_fwd_flops_per_ray(params, n_coarse: int, n_fine: int) -> float:
    """Analytic matmul-only forward FLOPs per ray from the real weight
    shapes: every dense W in the coarse net runs per coarse sample point,
    fine net per fine point (2*m*n FLOPs per point per W)."""
    import jax.tree_util as jtu

    per_net = {'coarse': 0.0, 'fine': 0.0}
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, 'key', getattr(k, 'idx', None)) for k in path]
        if keys[0] in per_net and keys[-1] == 'w':
            per_net[keys[0]] += 2 * leaf.shape[-2] * leaf.shape[-1]
    return per_net['coarse'] * n_coarse + per_net['fine'] * n_fine


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays_per_s', type=float, default=82_200.0,
                   help='measured rays/s to convert into achieved FLOP/s '
                        '(default: round-4 strict median)')
    p.add_argument('--flavor', default='strict',
                   choices=['strict', 'single_net', 'cull_fast'])
    a = p.parse_args()

    _assert_scan_counted_once()

    import bench
    kw, n_coarse, n_fine = {
        # strict: coarse net sees 64 pts/ray, fine net 64+16
        'strict': (dict(fast_grads=False), 64, 80),
        # reference surreal_single.txt: ONE net, 96 coarse pts + only the
        # 48 NEW importance samples run the MLP (merge reuses coarse raw)
        'single_net': (dict(single_net=True, N_samples=96,
                            N_importance=48, multires_views=0), 96 + 48, 0),
        'cull_fast': (dict(fast_grads=True, cull_ratio=0.125), 8, 24),
    }[a.flavor]
    state, step_fn, stacks, rays_per_dispatch = bench.build(**kw)

    key = jax.random.PRNGKey(0)
    cost = _cost(step_fn, state, stacks[0], key)
    flops_step = float(cost.get('flops', float('nan')))
    n_rays = 2048
    per_ray = flops_step / n_rays
    mlp_fwd = _mlp_fwd_flops_per_ray(state.params, n_coarse, n_fine)
    achieved = per_ray * a.rays_per_s
    print(json.dumps({
        'flavor': a.flavor,
        'flops_per_opt_step_G': round(flops_step / 1e9, 1),
        'flops_per_ray_M': round(per_ray / 1e6, 1),
        'mlp_fwd_matmul_M_per_ray': round(mlp_fwd / 1e6, 1),
        # bwd of a dense = 2 matmuls (dX, dW) at fwd cost each; the XLA
        # strict path keeps activations (remat_pe defaults off), so
        # fwd+bwd = 3x fwd
        'mlp_fwd_bwd_M_per_ray': round(3 * mlp_fwd / 1e6, 1),
        'mlp_share_of_step': round(3 * mlp_fwd / per_ray, 3),
        'transcendentals_k_per_ray': round(float(cost.get(
            'transcendentals', float('nan'))) / n_rays / 1e3, 1),
        'at_rays_per_s': a.rays_per_s,
        'achieved_TFLOP_s': round(achieved / 1e12, 1),
        'pct_v5e_bf16_peak': round(100 * achieved / V5E_BF16_PEAK, 1),
        'mlp_matmul_TFLOP_s': round(3 * mlp_fwd * a.rays_per_s / 1e12, 1),
        'bytes_accessed_per_step_GB': round(float(cost.get(
            'bytes accessed', float('nan'))) / 1e9, 2),
    }))


if __name__ == '__main__':
    main()
