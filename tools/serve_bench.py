"""Measured concurrent-client story for the render server (ROADMAP #4).

Trains a small model on a synthetic fixture, then measures the serving
path both ways on the real chip:
  serial    -- N requests, one render_path dispatch each
  coalesced -- the same N requests in ONE dispatch (what serve() does
               when concurrent clients queue up)
Reports per-request latency + speedup.  Usage: python tools/serve_bench.py

Tunnel hygiene (ADVICE r3): the warm pass and the timed pass use DISJOINT
pose sets (fixture poses 0-7 warm, 8-15 timed) with identical dispatch
shapes, so no compile lands in the timed region AND the tunnel cannot
memoize a timed dispatch it already saw during warmup; within the timed
pass every request is a distinct pose.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from anerf_tpu.utils.device_lock import acquire

acquire()

p = argparse.ArgumentParser()
p.add_argument('--n_req', type=int, default=8)
p.add_argument('--res', type=int, default=128)
cli = p.parse_args()

from anerf_tpu.config import TrainConfig
from anerf_tpu.data.fixtures import make_synthetic_h5
from anerf_tpu.data.surreal import SurrealDataset
from anerf_tpu.train.loop import train

d = os.path.join(tempfile.gettempdir(), 'serve_bench_fixture16')
h5 = os.path.join(d, 'syn_train_h5py.h5')
os.makedirs(d, exist_ok=True)
if not os.path.exists(h5):
    # 16 poses: 8 for the warm pass, 8 disjoint ones for the timed pass
    make_synthetic_h5(h5, n_kps=16, n_cams=3, H=64, W=64)

args = TrainConfig(
    expname='srv', basedir=d, dataset_type=('h5',), subject=(h5,),
    netdepth=8, netwidth=256, multires=7, multires_views=4,
    N_samples=64, N_importance=16, N_rand=1024, N_sample_images=16,
    use_viewdirs=True, use_cutoff=True, cutoff_viewdir=True,
    cutoff_inputs=True, use_background=True, opt_framecode=True,
    ext_scale=0.001, raw_noise_std=1.0, chunk=1024 * 16,
    compute_dtype='bfloat16', i_weights=100, i_testset=10**8,
    i_print=10**8, scan_unroll=10, n_iters=100, num_workers=0,
    no_reload=True)
ds = SurrealDataset(h5, N_samples=64, split='train')
train(args, ds, n_iters=100)

# serve against the fixture: patch the catalog entry like the CLI tests
import anerf_tpu.render.catalog as cat
_orig = cat.init_catalog


def fake(n_bullet=10):
    c = _orig(n_bullet)
    c['surreal']['female']['data_h5'] = h5
    c['surreal']['female']['bullet']['selected_idxs'] = np.array([0])
    c['surreal']['female']['bullet']['n_bullet'] = 3
    return c


cat.init_catalog = fake

import run_render as rr

r_args = argparse.Namespace(
    nerf_args=os.path.join(d, 'srv', 'args.txt'),
    ckptpath=os.path.join(d, 'srv', 'checkpoints'),
    render_res=[cli.res, cli.res], dataset='surreal', entry='female',
    white_bkgd=True, render_type='bullet', save_gt=False, fps=4,
    mesh_res=24, mesh_thres=5.0, mesh_overlay=False, render_refined=False,
    subject_idx=0, selected_idxs=None, selected_framecode=None,
    outputdir=os.path.join(d, 'render_out'), runname='t', eval=False,
    no_save=True)

sess = rr.RenderSession(r_args)
assert cli.n_req <= 8, 'fixture has 8 warm + 8 timed distinct poses'


def make_preps(pose_base: int, tag: str):
    out = []
    for i in range(cli.n_req):
        ns = argparse.Namespace(**vars(r_args))
        ns.selected_idxs = [pose_base + i % 8]  # distinct pose per client
        ns.runname = f'{tag}{i}'
        out.append(sess.prepare(ns))
    return out


warm_preps = make_preps(0, 'w')    # poses 0-7
timed_preps = make_preps(8, 'c')   # poses 8-15, disjoint from warmup

# warm BOTH dispatch shapes untimed (single-request buckets and the
# coalesced bucket) on the WARM pose set, then time each mode on the
# disjoint TIMED pose set — same shapes so no compile lands in the timed
# region, but no timed dispatch repeats a warm one byte-identically
# (the axon tunnel can memoize identical dispatches)
for p_ in warm_preps:
    sess.render_prepared([p_])
sess.render_prepared(warm_preps)

t0 = time.perf_counter()
for p_ in timed_preps:
    sess.render_prepared([p_])
serial = time.perf_counter() - t0

t0 = time.perf_counter()
sess.render_prepared(timed_preps)
coalesced = time.perf_counter() - t0

print(json.dumps({
    'metric': 'serve_coalesce_speedup',
    'n_requests': cli.n_req,
    'res': cli.res,
    'frames_per_request': 3,
    'serial_s_per_req': round(serial / cli.n_req, 3),
    'coalesced_s_per_req': round(coalesced / cli.n_req, 3),
    'value': round(serial / coalesced, 2),
    'unit': 'x (serial / coalesced wall time)',
}))
