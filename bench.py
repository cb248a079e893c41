"""Benchmark: training + render throughput of the flagship SURREAL recipe.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": R}

The north-star metric (BASELINE.md) is rays/sec/chip on the SURREAL recipe
(N_rand 2048, 64+16 samples, multires 7/4, cutoff PE, full 8x256 MLP).
vs_baseline is measured against a reference-implementation A100 estimate of
~120k train rays/s (the reference publishes no numbers; see BASELINE.md —
this constant documents the assumption and is revised when a measured
baseline lands).
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# Assumed reference (torch, A100) training throughput for the SURREAL recipe.
REFERENCE_TRAIN_RAYS_PER_SEC = 120_000.0


def main():
    from __graft_entry__ import _batch, _flagship
    from anerf_tpu.pose.pose_opt import (PoseOptConfig, init_pose_params,
                                         pose_anchor_tree)
    from anerf_tpu.train.state import (TrainState, init_opt_state,
                                       init_pose_opt_state,
                                       make_nerf_optimizer,
                                       make_pose_optimizer)
    from anerf_tpu.train.trainer import make_train_step_scan, stack_batches

    n_rays = 2048    # SURREAL recipe N_rand
    n_images = 128   # SURREAL recipe N_sample_images
    unroll = 10      # train steps fused per dispatch (amortizes host latency)
    args, cfg, params, pose = _flagship(n_frames=256, n_rays=n_rays,
                                        n_images=n_images)

    pose_cfg = PoseOptConfig(use_rot6d=args.opt_rot6d)
    opt = make_nerf_optimizer(args.lrate, args.lrate_decay,
                              args.lrate_decay_rate, args.decay_unit)
    popt = make_pose_optimizer(args.opt_pose_lrate,
                               args.opt_pose_lrate_decay,
                               args.opt_pose_decay_rate,
                               args.opt_pose_decay_unit)
    pose_params = init_pose_params(pose['kp3d'], pose['bones'], pose_cfg)
    state = TrainState(
        step=jnp.int32(0), params=params,
        opt_state=init_opt_state(opt, params),
        pose_params=pose_params,
        pose_opt_state=init_pose_opt_state(popt, pose_params)[0],
        pose_grad_acc=init_pose_opt_state(popt, pose_params)[1],
        anchors=pose_anchor_tree(pose['kp3d'], pose['bones']))

    rest = jnp.asarray(pose['rest_pose'])
    step_fn = make_train_step_scan(args, cfg, pose_cfg, rest, opt, popt,
                                   unroll=unroll)

    batches = stack_batches([_batch(pose, n_rays, n_images)
                             for _ in range(unroll)])
    key = jax.random.PRNGKey(0)

    # warmup / compile
    state, _ = step_fn(state, batches, key)
    jax.block_until_ready(state.params)

    n_dispatch = 5
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        state, out = step_fn(state, batches, jax.random.fold_in(key, i))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * unroll * n_dispatch / dt
    print(json.dumps({
        'metric': 'train_rays_per_sec',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec / REFERENCE_TRAIN_RAYS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
