"""Measure --sr_grads (stochastically-rounded bf16 cotangents) speed on
the flagship device-only step, same protocol as bench.py.

Configs, same session so the tunnel band is comparable:
  default (f32 cotangents, XLA)      -- the control
  fast_grads (RTN bf16 cotangents)   -- the deterministic fast path
  sr_grads                            -- the unbiased fast path under test
  sr_grads + cull 0.125               -- vs the fast_grads headline
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from anerf_tpu.utils.device_lock import acquire, wait_until_live

acquire()
_err = wait_until_live()
if _err is not None:
    sys.exit(f'[{__file__}] {_err}')

import bench

rows = {}
for label, kw in (
        ('default', {}),
        ('fast_grads', dict(fast_grads=True)),
        ('sr_grads', dict(sr_grads=True)),
        ('sr_cull0125', dict(sr_grads=True, cull_ratio=0.125)),
        ('fast_cull0125', dict(fast_grads=True, cull_ratio=0.125)),
):
    t0 = time.perf_counter()
    state, step_fn, stacks, rpd = bench.build(**kw)
    med, best, _ = bench.measure(state, step_fn, stacks, rpd)
    rows[label] = {'median': round(med, 1), 'best': round(best, 1),
                   'wall_s': round(time.perf_counter() - t0, 1)}
    print(label, rows[label], flush=True)

print(json.dumps(rows))
