"""Measured concurrent-client story for the render server (ROADMAP #4).

Trains a small model on a synthetic fixture, then measures the serving
path both ways on the real chip:
  serial    -- N requests, one render_path dispatch each
  coalesced -- the same N requests in ONE dispatch (what serve() does
               when concurrent clients queue up)
Reports per-request latency + speedup.  Usage: python tools/serve_bench.py

Tunnel hygiene (ADVICE r3): every timed section owns a DISJOINT pose
slice of a 64-pose fixture (0-7 warm, 8-15 serial/coalesced, 16+16i for
TCP concurrency row i) with identical dispatch shapes, so no compile
lands in a timed region AND the tunnel cannot memoize a timed dispatch
it saw anywhere earlier in the session.
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

from anerf_tpu.utils.device_lock import acquire, wait_until_live

acquire()
_err = wait_until_live()
if _err is not None:
    sys.exit(f'[{__file__}] {_err}')

p = argparse.ArgumentParser()
p.add_argument('--n_req', type=int, default=8)
p.add_argument('--res', type=int, default=128)
p.add_argument('--tcp_clients', type=int, nargs='*', default=[],
               help='also measure the TCP front-end at each given '
                    'concurrency: N concurrent client PROCESSES hammering '
                    'one server (e.g. --tcp_clients 1 4 8), with p50/p95 '
                    'latency + aggregate throughput per row '
                    '(VERDICT r4 #4); at most 3 rows (pose budget)')
p.add_argument('--tcp_req', type=int, default=16,
               help='total requests per TCP concurrency row (max 16: '
                    'each row owns a disjoint 16-pose slice)')
p.add_argument('--fixture_seed', type=int, default=0,
               help='fixture RNG seed; bump on RE-runs in the same tunnel '
                    'session so no dispatch is byte-identical to an '
                    'earlier run (fresh data -> fresh trained weights)')
cli = p.parse_args()

from anerf_tpu.config import TrainConfig
from anerf_tpu.data.fixtures import make_synthetic_h5
from anerf_tpu.data.surreal import SurrealDataset
from anerf_tpu.train.loop import train

d = os.path.join(tempfile.gettempdir(),
                 f'serve_bench_fixture64_s{cli.fixture_seed}')
h5 = os.path.join(d, 'syn_train_h5py.h5')
os.makedirs(d, exist_ok=True)
if not os.path.exists(h5):
    # 64 poses: 8 warm, 8 serial/coalesced timed, and 16 per TCP
    # concurrency row (up to 3 rows) — every timed dispatch anywhere in
    # the session is a DISTINCT pose, because the axon tunnel memoizes
    # byte-identical dispatches and a reused pose reads artificially fast
    make_synthetic_h5(h5, n_kps=64, n_cams=3, H=64, W=64,
                      seed=cli.fixture_seed)

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
assert cli.n_req <= 8, 'serial/coalesced section owns poses 0-15 only'
assert cli.tcp_req <= 16 and len(cli.tcp_clients) <= 3, \
    'TCP rows own disjoint 16-pose slices of the 64-pose fixture'


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

result = {
    'metric': 'serve_coalesce_speedup',
    'n_requests': cli.n_req,
    'res': cli.res,
    'frames_per_request': 3,
    'serial_s_per_req': round(serial / cli.n_req, 3),
    'coalesced_s_per_req': round(coalesced / cli.n_req, 3),
    'value': round(serial / coalesced, 2),
    'unit': 'x (serial / coalesced wall time)',
}

if cli.tcp_clients:
    # TCP front-end under REAL concurrency: the server runs in a thread
    # (it owns this process's device client); N client processes each
    # send n_req/N bullet requests with distinct poses. Warm pass uses
    # poses 0-7, timed passes poses 8-15 (tunnel memoization hygiene).
    import subprocess
    import threading

    class _ReadyPipe:
        """Captures serve_tcp's ready line; exposes the bound port."""
        def __init__(self):
            self.evt = threading.Event()
            self.port = None

        def write(self, s):
            for ln in s.strip().splitlines():
                try:
                    self.port = json.loads(ln)['port']
                    self.evt.set()
                except Exception:
                    pass

        def flush(self):
            pass

    ready = _ReadyPipe()
    srv_args = argparse.Namespace(**vars(r_args))
    threading.Thread(target=rr.serve_tcp, args=(srv_args,),
                     kwargs={'port': 0, 'stdout': ready},
                     daemon=True).start()
    assert ready.evt.wait(timeout=600), 'server never became ready'
    port = ready.port

    CLIENT = (
        "import json,socket,sys,time\n"
        "port,rb,base,n=(int(a) for a in sys.argv[1:5])\n"
        "s=socket.create_connection(('127.0.0.1',port),timeout=600)\n"
        "f=s.makefile('r')\n"
        "lats=[]\n"
        "for j in range(n):\n"
        "    t0=time.perf_counter()\n"
        "    s.sendall((json.dumps({'render_type':'bullet',"
        "'selected_idxs':[rb+(base+j)%16],'runname':'tcp%d_%d'%(base,j),"
        "'no_save':True})+'\\n').encode())\n"
        "    r=json.loads(f.readline())\n"
        "    assert r['ok'],r\n"
        "    lats.append([time.perf_counter()-t0,"
        "r.get('render_seconds',-1.0)])\n"
        "print(json.dumps(lats))\n")

    def run_clients(n_clients, per_client, row_base):
        procs = [subprocess.Popen(
            [sys.executable, '-c', CLIENT, str(port), str(row_base),
             str(i * per_client), str(per_client)],
            stdout=subprocess.PIPE, text=True)
            for i in range(n_clients)]
        t0 = time.perf_counter()
        lats, srv = [], []
        for pr in procs:
            out, _ = pr.communicate(timeout=1200)
            assert pr.returncode == 0
            for client_lat, server_s in json.loads(out):
                lats.append(client_lat)
                srv.append(server_s)
        return time.perf_counter() - t0, lats, srv

    # warmup (compile both shapes) on the warm pose set
    import socket as _socket
    ws = _socket.create_connection(('127.0.0.1', port), timeout=600)
    wf = ws.makefile('r')
    for i in range(2):
        ws.sendall((json.dumps({'render_type': 'bullet',
                                'selected_idxs': [i], 'runname': f'w{i}',
                                'no_save': True}) + '\n').encode())
        json.loads(wf.readline())
    # coalesced-shape warm: burst 4 without reading
    for i in range(2, 6):
        ws.sendall((json.dumps({'render_type': 'bullet',
                                'selected_idxs': [i], 'runname': f'wb{i}',
                                'no_save': True}) + '\n').encode())
    for _ in range(4):
        json.loads(wf.readline())

    def pct(xs, q):
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(round(q / 100 * (len(xs) - 1))))]

    tcp_rows = []
    for row_i, n_clients in enumerate(cli.tcp_clients):
        # each concurrency row owns a disjoint 16-pose slice so no timed
        # dispatch can hit the tunnel's memoization of an earlier row
        wall, lats, srv = run_clients(n_clients, cli.tcp_req // n_clients,
                                      row_base=16 + 16 * row_i)
        n_done = n_clients * (cli.tcp_req // n_clients)
        tcp_rows.append({
            'clients': n_clients, 'n_requests': n_done,
            'req_per_s': round(n_done / wall, 3),
            'mean_latency_s': round(sum(lats) / len(lats), 3),
            'p50_latency_s': round(pct(lats, 50), 3),
            'p95_latency_s': round(pct(lats, 95), 3),
            # device dispatch time per request, measured server-side —
            # separates device service from host/client queueing (the
            # bench host has 1 CPU core: concurrent client PROCESSES
            # time-slice it, so client-visible latency under concurrency
            # is mostly host scheduling, not the server or the chip)
            'mean_server_render_s': round(sum(srv) / len(srv), 3),
        })
        print(tcp_rows[-1], flush=True)
    ws.sendall(b'{"cmd": "quit"}\n')
    base = tcp_rows[0] if tcp_rows else None
    result['tcp'] = {
        'req_per_row': cli.tcp_req,
        'rows': tcp_rows,
        # aggregate-throughput gain of the most concurrent row over the
        # 1-client (sequential) row — the coalescing verdict in one number
        'throughput_gain': (round(tcp_rows[-1]['req_per_s']
                                  / base['req_per_s'], 2)
                            if base and len(tcp_rows) > 1 else None),
    }

print(json.dumps(result))
