"""Per-op device-time breakdown of one bench train-step config.

Builds the same scanned train step bench.py measures, captures a
jax.profiler trace around a few steady-state dispatches on the real chip,
then parses the trace-viewer JSON (plugins/profile/*/trace.json.gz) and
prints device-side op totals grouped by a readable key — the evidence
base for kernel-fusion decisions (ROADMAP r4 #1: where do the ~30 ms of
the strict fused step go?).

Usage: python tools/step_trace.py [--fused] [--fast_grads] [--cull 0.125]
           [--dispatches 3] [--top 40] [--json out.json]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from anerf_tpu.utils.device_lock import acquire, wait_until_live

acquire()
_err = wait_until_live()
if _err is not None:
    sys.exit(f'[{__file__}] {_err}')

import jax

import bench


def capture(build_kw, n_dispatch=3, warmup=3):
    state, step_fn, stacks, rpd = bench.build(**build_kw)
    key = jax.random.PRNGKey(0)
    k = 0
    for _ in range(warmup):
        state, _ = step_fn(state, stacks[k % 2], jax.random.fold_in(key, k))
        k += 1
    jax.block_until_ready(state.params)

    tdir = tempfile.mkdtemp(prefix='step_trace_')
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state, _ = step_fn(state, stacks[k % 2], jax.random.fold_in(key, k))
        k += 1
    jax.block_until_ready(state.params)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return tdir, wall, rpd * n_dispatch


def parse_trace(tdir):
    """Aggregate device-lane complete events by op name."""
    paths = glob.glob(os.path.join(tdir, '**', '*trace.json.gz'),
                      recursive=True)
    if not paths:
        raise SystemExit(f'no trace.json.gz under {tdir}')
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # device lanes: process names containing 'TPU' (XLA Ops rows)
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_name[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tid_name[(e['pid'], e['tid'])] = e['args'].get('name', '')
    device_pids = {p for p, n in pid_name.items()
                   if 'TPU' in n or 'tpu' in n.lower()}
    totals = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        lane = tid_name.get((e['pid'], e['tid']), '')
        # keep compute lanes; skip host threads that live under the
        # device process in some layouts
        if 'XLA' not in lane and 'Steps' not in lane and lane != '':
            pass
        name = e.get('name', '?')
        totals[(lane, name)] += e.get('dur', 0)
        counts[(lane, name)] += 1
    return totals, counts


def group_key(name: str) -> str:
    """Collapse fusion suffixes: 'fusion.123' -> 'fusion', keep custom
    call names (pallas kernels keep their kernel name)."""
    base = name.split('.')[0]
    return base


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--fused', action='store_true')
    p.add_argument('--fast_grads', action='store_true')
    p.add_argument('--cull', type=float, default=0.0)
    p.add_argument('--dispatches', type=int, default=3)
    p.add_argument('--top', type=int, default=40)
    p.add_argument('--raw', action='store_true',
                   help='print ungrouped op names')
    p.add_argument('--json', type=str, default=None)
    a = p.parse_args()

    build_kw = dict(fused_kernel=a.fused, fast_grads=a.fast_grads,
                    cull_ratio=a.cull)
    tdir, wall, rays = capture(build_kw, n_dispatch=a.dispatches)
    totals, counts = parse_trace(tdir)

    lanes = sorted({lane for lane, _ in totals})
    print(f'config: {build_kw}')
    print(f'wall: {wall:.3f}s for {a.dispatches} dispatches '
          f'({rays / wall:,.0f} rays/s)   trace: {tdir}')
    print(f'device lanes: {lanes}')

    grouped = collections.Counter()
    gcounts = collections.Counter()
    for (lane, name), us in totals.items():
        key = name if a.raw else group_key(name)
        grouped[(lane, key)] += us
        gcounts[(lane, key)] += counts[(lane, name)]

    per_lane = collections.Counter()
    for (lane, _), us in grouped.items():
        per_lane[lane] += us

    rows = []
    for (lane, key), us in grouped.most_common(a.top):
        share = us / max(per_lane[lane], 1)
        rows.append({'lane': lane, 'op': key, 'ms': us / 1000.0,
                     'n': gcounts[(lane, key)],
                     'lane_share': round(share, 4)})
        print(f'{us / 1000.0:>10.3f} ms  {gcounts[(lane, key)]:>6}x '
              f'{share:>7.2%}  [{lane}] {key}')
    for lane, us in per_lane.most_common():
        print(f'lane total {us / 1000.0:>10.3f} ms  [{lane}]')
    if a.json:
        with open(a.json, 'w') as f:
            json.dump({'config': build_kw, 'wall_s': wall,
                       'rays_per_s': rays / wall, 'rows': rows}, f,
                      indent=1)


if __name__ == '__main__':
    main()
