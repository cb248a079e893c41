"""In-loop end-to-end training rate on the headline config (PERF.md).

Runs the REAL training loop (BatchLoader workers + C++ super-batch
assembler + scanned dispatch) on a synthetic fixture at flagship model
size and reports the steady-state in-loop rays/s, excluding the
compile/warmup region. Re-run whenever the headline config changes.

Usage:  python .scratch/e2e_rate.py [--steps 8000] [--cull 0.125]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from anerf_tpu.utils.device_lock import acquire


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=8000)
    p.add_argument('--warm_steps', type=int, default=2000)
    p.add_argument('--cull', type=float, default=0.125)
    p.add_argument('--no_fast', action='store_true')
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--unroll', type=int, default=20)
    args_cli = p.parse_args()

    acquire()

    from anerf_tpu.config import TrainConfig
    from anerf_tpu.data.fixtures import make_synthetic_h5
    from anerf_tpu.data.surreal import SurrealDataset
    from anerf_tpu.train.loop import train

    d = os.path.join(tempfile.gettempdir(), 'e2e_rate_fixture')
    h5 = os.path.join(d, 'syn_train_h5py.h5')
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(h5):
        make_synthetic_h5(h5, n_kps=8, n_cams=3, H=64, W=64)

    args = TrainConfig(
        expname='e2e_rate', basedir=d,
        dataset_type=('h5',), subject=(h5,),
        netdepth=8, netwidth=256, multires=7, multires_views=4,
        N_samples=64, N_importance=16, N_rand=2048, N_sample_images=32,
        use_viewdirs=True, use_cutoff=True, cutoff_viewdir=True,
        cutoff_inputs=True, use_background=True, opt_framecode=True,
        ext_scale=0.001, lrate=5e-4, raw_noise_std=1.0,
        i_print=200, i_weights=10**8, i_testset=10**8,
        i_pose_weights=10**8, chunk=1024 * 16, compute_dtype='bfloat16',
        num_workers=args_cli.workers, scan_unroll=args_cli.unroll,
        cull_ratio=args_cli.cull, fast_grads=not args_cli.no_fast,
        no_reload=True, seed=0)

    ds = SurrealDataset(h5, N_samples=args.N_rand // args.N_sample_images,
                        split='train')

    marks = []   # (step, wall time) at each i_print crossing

    def log_fn(rec):
        marks.append((rec['step'], time.perf_counter()))

    t0 = time.perf_counter()
    train(args, ds, n_iters=args_cli.steps, log_fn=log_fn)
    total_dt = time.perf_counter() - t0

    steady = [(s, t) for s, t in marks if s >= args_cli.warm_steps]
    if len(steady) < 2:
        raise SystemExit('not enough steady-state marks: ' + repr(marks))
    (s0, w0), (s1, w1) = steady[0], steady[-1]
    rate = (s1 - s0) * args.N_rand / (w1 - w0)
    print(json.dumps({
        'metric': 'e2e_inloop_rays_per_sec',
        'value': round(rate, 1),
        'unit': 'rays/s',
        'config': ('cull %.3g %s, workers=%d unroll=%d' % (
            args_cli.cull, 'fast' if not args_cli.no_fast else 'strict',
            args_cli.workers, args_cli.unroll)),
        'steady_window_steps': [s0, s1],
        'total_wall_s': round(total_dt, 1),
        'incl_compile_rays_per_sec': round(
            args_cli.steps * args.N_rand / total_dt, 1),
    }))


if __name__ == '__main__':
    main()
