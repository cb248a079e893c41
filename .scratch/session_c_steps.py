"""Round-5 session C: full-step candidates in ONE session, with spreads.

Strict-protocol rows (VERDICT r4 #2/#3), single_net rows (the
reference's own surreal_single.txt compute saving, preserved in both
our XLA and fused paths — raycaster.py:392-394), and the cull-0.125
headline candidates with the round-5 tile budgets in place.

Writes /root/repo/artifacts/step_candidates_r5.json.
"""
import json
import time

import bench
from anerf_tpu.utils.device_lock import acquire

acquire()
err = bench.device_liveness_check()
if err:
    raise SystemExit(f'device not live: {err}')

# single_net rows use the reference's OWN surreal_single.txt shapes
# (N_samples=96, N_importance=48, multires_views=0 — only the 48 new
# samples run the MLP at the fine merge, so total MLP samples/ray is
# 96+48=144, same as the dual-net protocol's 64+80).
_SINGLE = dict(single_net=True, N_samples=96, N_importance=48,
               multires_views=0)
CANDIDATES = [
    ('strict_xla', dict(fast_grads=False)),
    ('strict_fused', dict(fused_kernel=True)),
    ('single_net_xla', dict(_SINGLE)),
    ('single_net_fused', dict(fused_kernel=True, **_SINGLE)),
    ('cull_xla_fast', dict(fast_grads=True, cull_ratio=0.125)),
    ('cull_fused_f32', dict(fused_kernel=True, cull_ratio=0.125)),
    ('cull_fused_bf16', dict(fused_kernel=True, fast_grads=True,
                             cull_ratio=0.125)),
    ('cull_fast_single_net', dict(fast_grads=True, cull_ratio=0.125,
                                  **_SINGLE)),
]

rows = []
for name, kw in CANDIDATES:
    t0 = time.perf_counter()
    try:
        state, step_fn, stacks, rpd = bench.build(**kw)
        med, best, rates, _ = bench.measure(state, step_fn, stacks, rpd)
        row = {'name': name, 'kw': kw, 'median': round(med, 1),
               'best': round(best, 1),
               'rates': [round(r, 1) for r in rates],
               'build_plus_measure_s': round(time.perf_counter() - t0, 1)}
    except Exception as e:
        row = {'name': name, 'kw': kw, 'error': str(e)[:200]}
    rows.append(row)
    print(row, flush=True)

with open('/root/repo/artifacts/step_candidates_r5.json', 'w') as f:
    json.dump({'session': 'step_candidates_r5', 'rows': rows}, f, indent=1)
print(json.dumps({'done': len(rows)}))
