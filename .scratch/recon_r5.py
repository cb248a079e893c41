"""Round-5 reconciliation session (VERDICT r4 weak #1 / next-round #1b).

One device session measuring, with repeats:
  1. e2e in-loop rate over BOTH windows ([1500,4000] and [2000,8000])
     from the SAME 8000-step train() runs (x2 repeats) — settles whether
     round 3's 394.9k or round 4's 221.6k reading was real, and whether
     the window choice explains the 78% gap.
  2. render box-rays/s at cull 0.125, x3 repeats -> spread.
  3. device-only headline (cull 0.125 + fast_grads), x2 builds -> spread.

Writes /root/repo/artifacts/recon_r5.json.
"""
import json
import os
import statistics
import time

import bench
from anerf_tpu.utils.device_lock import acquire

acquire()
err = bench.device_liveness_check()
if err:
    raise SystemExit(f'device not live: {err}')

out = {'session': 'recon_r5'}

# ---- 1) e2e with marks, both windows from one run -----------------------
import tempfile

from anerf_tpu.config import TrainConfig
from anerf_tpu.data.surreal import SurrealDataset
from anerf_tpu.train.loop import train

d = os.path.join(tempfile.gettempdir(), 'e2e_rate_fixture')
h5 = os.path.join(d, 'syn_train_h5py.h5')
os.makedirs(d, exist_ok=True)
if not os.path.exists(h5):
    from anerf_tpu.data.fixtures import make_synthetic_h5
    make_synthetic_h5(h5, n_kps=8, n_cams=3, H=64, W=64)


def e2e_run(steps=8000):
    args = TrainConfig(
        expname='e2e_rate', basedir=d,
        dataset_type=('h5',), subject=(h5,),
        netdepth=8, netwidth=256, multires=7, multires_views=4,
        N_samples=64, N_importance=16, N_rand=2048, N_sample_images=32,
        use_viewdirs=True, use_cutoff=True, cutoff_viewdir=True,
        cutoff_inputs=True, use_background=True, opt_framecode=True,
        ext_scale=0.001, lrate=5e-4, raw_noise_std=1.0,
        i_print=100, i_weights=10**8, i_testset=10**8,
        i_pose_weights=10**8, chunk=1024 * 16, compute_dtype='bfloat16',
        num_workers=4, scan_unroll=20,
        cull_ratio=0.125, fast_grads=True,
        no_reload=True, seed=0)
    ds = SurrealDataset(h5, N_samples=args.N_rand // args.N_sample_images,
                        split='train')
    marks = []

    def log_fn(rec):
        marks.append((rec['step'], time.perf_counter()))
        if len(marks) <= 3 or marks[-1][0] % 2000 == 0:
            print(f'  mark step={rec["step"]}', flush=True)

    print('e2e_run: building/compiling...', flush=True)
    train(args, ds, n_iters=steps, log_fn=log_fn)

    def window(lo, hi):
        st = [(s, t) for s, t in marks if lo <= s <= hi]
        (s0, w0), (s1, w1) = st[0], st[-1]
        return round((s1 - s0) * args.N_rand / (w1 - w0), 1)

    # also a per-1000-step rate profile to see any drift within the run
    prof = {}
    for lo in range(1000, steps, 1000):
        st = [(s, t) for s, t in marks if lo <= s <= lo + 1000]
        if len(st) >= 2:
            (s0, w0), (s1, w1) = st[0], st[-1]
            prof[f'{lo}-{lo+1000}'] = round(
                (s1 - s0) * args.N_rand / (w1 - w0), 1)
    return {'w_1500_4000': window(1500, 4000),
            'w_2000_8000': window(2000, 8000),
            'profile_per_1k': prof}

out['e2e_runs'] = [e2e_run(), e2e_run()]
print('e2e:', json.dumps(out['e2e_runs']), flush=True)

# ---- 2) render, x3 timed passes -----------------------------------------
_, r_rates = bench.measure_render(cull_ratio=0.125, n_repeats=3)
out['render_box_rays_per_sec'] = [round(r, 1) for r in r_rates]
print('render:', out['render_box_rays_per_sec'], flush=True)

# ---- 3) device-only headline, x2 builds ---------------------------------
heads = []
for _ in range(2):
    state, step_fn, stacks, rpd = bench.build(fast_grads=True,
                                              cull_ratio=0.125)
    med, best, rates, _ = bench.measure(state, step_fn, stacks, rpd)
    heads.append({'median': round(med, 1), 'best': round(best, 1),
                  'rates': [round(r, 1) for r in rates]})
out['headline_device_only'] = heads
print('headline:', heads, flush=True)

mid = statistics.median([h['median'] for h in heads])
out['summary'] = {
    'e2e_w1500_4000_mean': statistics.mean(
        r['w_1500_4000'] for r in out['e2e_runs']),
    'e2e_w2000_8000_mean': statistics.mean(
        r['w_2000_8000'] for r in out['e2e_runs']),
    'render_median': statistics.median(out['render_box_rays_per_sec']),
    'headline_median': mid,
}
with open('/root/repo/artifacts/recon_r5.json', 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out['summary']))
