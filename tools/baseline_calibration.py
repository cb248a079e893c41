"""Measured anchor for the BASELINE.md reference-throughput band.

Runs the ACTUAL reference torch trainer (core/trainer.py:230-483, via the
tests/test_trainer_parity.py bridge that loads reference modules and pushes
our initial weights through the .tar bridge) and our jitted train step on
IDENTICAL inputs, config, and hardware (this host's CPU), and reports the
relative per-step efficiency

    r = (reference rays/s) / (ours rays/s)        [same chip, same FLOPs]

BASELINE.md's 20-120k band for the reference's A100 throughput was derived
from FLOPs/ray x assumed utilization; r replaces the "research torch
pipeline overhead" assumption with a measurement. The anchored estimate is

    ref_A100 ~= ours_TPU x (A100_peak / TPU_peak) x r

(stated caveats: single-host-CPU r transfers imperfectly to A100 — python/
framework overhead shrinks as matmuls speed up, so r measured on CPU is
CHARITABLE to the reference on faster hardware; peaks are dense f32/TF32
figures.)

Usage: JAX_PLATFORMS=cpu python tools/baseline_calibration.py \
         [--rays 1024] [--steps 3] [--out artifacts/baseline_calib.json]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

# the flagship/protocol config (SURREAL recipe), f32, deterministic
# sampling so both implementations run the identical FLOPs
PROTOCOL_OVERRIDES = dict(
    netdepth=8, netwidth=256, netdepth_fine=8, netwidth_fine=256,
    multires=7, multires_views=4,
    N_samples=64, N_importance=16,
    perturb=0.0, raw_noise_std=0.0, ray_noise_std=0.0,
    use_viewdirs=True, use_cutoff=True, cutoff_viewdir=True,
    cutoff_inputs=True, use_background=True, opt_framecode=True,
    ext_scale=0.001, loss_fn='MSE', coarse_weight=0.25,
    opt_pose=True, opt_rot6d=True, opt_pose_step=20,
    opt_pose_tol=0.01, opt_pose_coef=2.0, opt_pose_lrate=5e-4,
    lrate=5e-4, lrate_decay=500, lrate_decay_rate=0.1, decay_unit=1000,
    opt_pose_lrate_decay=500, opt_pose_decay_rate=0.1,
    opt_pose_decay_unit=1000,
)

# dense peak FLOP/s used by the anchoring formula (f32/TF32 class, no
# sparsity): A100 TF32 156e12, TPU v5e bf16 197e12 / int8 394e12 — the
# protocol step on v5e runs f32 cotangents through bf16-capable MXUs;
# use the bf16 dense figure for the v5e and TF32 for the A100, and carry
# the formula so any other peak assumption is one multiply away.
A100_PEAK = 156e12
V5E_PEAK = 197e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=1024)
    p.add_argument('--steps', type=int, default=3)
    p.add_argument('--tpu_protocol_rays_per_sec', type=float, default=None,
                   help='our measured protocol_default rays/s on the real '
                        'chip (BENCH extras); anchors ref_A100')
    p.add_argument('--out', type=str,
                   default=os.path.join(REPO, 'artifacts',
                                        'baseline_calib.json'))
    a = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import tempfile
    from pathlib import Path

    import torch

    import test_trainer_parity as tp

    # re-point the parity bridge at the protocol scale
    tp.ARGS_OVERRIDES = dict(PROTOCOL_OVERRIDES, N_rand=a.rays)
    tp.N_RAYS = a.rays
    tp.STEPS = a.steps   # N_IMAGES/N_FRAMES stay at the bridge's defaults
                         # (the scene builder hard-codes 2 image slots)

    rng = np.random.default_rng(0)
    scene = tp._shared_scene(rng)
    tmp = Path(tempfile.mkdtemp(prefix='baseline_calib_'))

    print(f'building ours (jit, cpu) at N_rand={a.rays} ...', flush=True)
    our_args, params, state, step_fn, our_batch = tp._build_ours(scene)
    key = jax.random.PRNGKey(0)
    state, out = step_fn(state, our_batch, key)      # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(a.steps):
        state, out = step_fn(state, our_batch, key)
    jax.block_until_ready(state.params)
    ours_dt = (time.perf_counter() - t0) / a.steps
    ours_rate = a.rays / ours_dt
    print(f'ours: {ours_dt * 1000:.1f} ms/step = {ours_rate:,.0f} rays/s',
          flush=True)

    print('building the reference torch trainer (cpu) ...', flush=True)
    ref_args, ref_trainer, ref_batch = tp._build_reference(
        tmp, scene, params)
    ref_trainer.train_batch(dict(ref_batch), i=1, global_step=1)  # warm
    t0 = time.perf_counter()
    for i in range(2, a.steps + 2):
        ref_trainer.train_batch(dict(ref_batch), i=i, global_step=i)
    ref_dt = (time.perf_counter() - t0) / a.steps
    ref_rate = a.rays / ref_dt
    print(f'reference: {ref_dt * 1000:.1f} ms/step = {ref_rate:,.0f} '
          f'rays/s', flush=True)

    r = ref_rate / ours_rate
    result = {
        'metric': 'baseline_cpu_calibration',
        'host_cpu_threads': torch.get_num_threads(),
        'n_rand': a.rays, 'steps': a.steps,
        'ours_cpu_rays_per_sec': round(ours_rate, 1),
        'reference_cpu_rays_per_sec': round(ref_rate, 1),
        'ref_over_ours': round(r, 4),
        'formula': 'ref_A100 ~= ours_TPU * (A100_peak/TPU_peak) * r',
        'a100_peak_flops': A100_PEAK, 'v5e_peak_flops': V5E_PEAK,
    }
    if a.tpu_protocol_rays_per_sec:
        result['anchored_ref_a100_rays_per_sec'] = round(
            a.tpu_protocol_rays_per_sec * (A100_PEAK / V5E_PEAK) * r, 1)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
