"""In-loop end-to-end training rate on the headline config (PERF.md).

Thin CLI over `bench.measure_e2e` — the same measurement also runs as a
guarded extra of the main `bench.py` line. Re-run whenever the headline
config changes.

Usage:  python tools/e2e_rate.py [--steps 8000] [--cull 0.125]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from anerf_tpu.utils.device_lock import acquire, wait_until_live


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=8000)
    p.add_argument('--warm_steps', type=int, default=2000)
    p.add_argument('--cull', type=float, default=0.125)
    p.add_argument('--no_fast', action='store_true')
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--unroll', type=int, default=20)
    a = p.parse_args()

    acquire()
    err = wait_until_live()
    if err is not None:
        sys.exit(f'[e2e_rate] {err}')
    import bench

    rate, prof = bench.measure_e2e(
        steps=a.steps, warm_steps=a.warm_steps, cull_ratio=a.cull,
        fast_grads=not a.no_fast, workers=a.workers, unroll=a.unroll)
    print(json.dumps({
        'metric': 'e2e_inloop_rays_per_sec',
        'value': round(rate, 1),
        'per_1k_rates': prof,
        'unit': 'rays/s',
        'config': ('cull %.3g %s, workers=%d unroll=%d' % (
            a.cull, 'strict' if a.no_fast else 'fast', a.workers,
            a.unroll)),
    }))


if __name__ == '__main__':
    main()
