"""Training orchestration: setup, iteration loop, logging, checkpoints, val.

The TPU equivalent of run_nerf.py:491-625 + Trainer wiring
(core/trainer.py:205-290). All device work happens in the jitted train step;
this loop only feeds prefetched batches, logs scalars, and handles periodic
checkpoint/validation.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig, save_args_txt
from ..data.pipeline import BatchLoader
from ..parallel.mesh import make_mesh, shard_ray_batch
from ..pose.pose_opt import (PoseOptConfig, init_pose_params,
                             pose_anchor_tree)
from ..render.factory import build_render_config, init_render_params
from ..render.render_path import render_path
from ..utils.metrics import evaluate_metric_arrays
from .checkpoint import (restore_checkpoint, save_checkpoint,
                         save_pose_checkpoint)
from .state import (TrainState, init_opt_state, init_pose_opt_state,
                    make_nerf_optimizer, make_pose_optimizer)
from .trainer import (derive_schedules, make_train_step,
                      make_train_step_scan, stack_batches)


def get_dataset(args: TrainConfig):
    """Dataset construction facade (reference core/load_data.py:87-143)."""
    from ..data.catalog import get_dataset_from_catalog
    from ..data.dataset import ConcatH5Dataset

    subject, dataset_type = list(args.subject), list(args.dataset_type)
    if len(subject) > len(dataset_type):
        assert len(dataset_type) == 1
        dataset_type = dataset_type * len(subject)

    n_samples = args.N_rand // args.N_sample_images
    n_nms = n_samples * args.P_nms
    datasets = [get_dataset_from_catalog(args, n_samples, d, s, n_nms)
                for d, s in zip(dataset_type, subject)]
    if len(datasets) == 1:
        return datasets[0]
    return ConcatH5Dataset(datasets)


@dataclasses.dataclass
class TrainContext:
    args: TrainConfig
    cfg: Any
    state: TrainState
    step_fn: Any
    loader: Any
    data_attrs: Dict[str, Any]
    render_data: Dict[str, Any]
    mesh: Any
    optimizer: Any
    pose_optimizer: Any
    pose_cfg: Optional[PoseOptConfig]
    rest_pose: Optional[jnp.ndarray]
    exp_dir: str
    start_step: int


def setup(args: TrainConfig, dataset=None) -> TrainContext:
    exp_dir = os.path.join(args.basedir, args.expname)
    os.makedirs(exp_dir, exist_ok=True)

    from ..utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache(args.xla_cache_dir)

    if args.opt_pose and 0.0 < args.cull_ratio < 0.5:
        print('note: --opt_pose with deep culling measured EQUAL to the '
              'no-cull control under the strided in-window selector '
              '(151 -> 81 mm MPJPE at cull 0.25); see the PERF.md '
              'pose-refinement study for the evidence and its fixture '
              'scope.')

    if dataset is None:
        dataset = get_dataset(args)
    data_attrs = dataset.get_meta()

    # pin the resolved framecode count into the experiment snapshot so a
    # render-time re-parse reconstructs the exact architecture (the
    # reference instead digs it out of the ckpt weights, run_render.py:95-99)
    if args.n_framecodes is None:
        args = dataclasses.replace(args,
                                   n_framecodes=int(data_attrs['n_views']))
    save_args_txt(args, exp_dir)
    render_data = dataset.get_render_data()
    unroll_ = max(1, args.scan_unroll)
    loader = BatchLoader(dataset, n_images=args.N_sample_images,
                         prefetch=4,
                         seed=args.seed,
                         num_workers=min(max(args.num_workers, 1), 8),
                         stack=unroll_,
                         stack_fn=stack_batches if unroll_ > 1 else None)

    cfg = build_render_config(args, data_attrs)
    key = jax.random.PRNGKey(args.seed)
    params = init_render_params(key, args, cfg)

    freeze = None
    if args.finetune and args.fix_layer > 0:
        from anerf_tpu.train.state import freeze_mask_flat
        freeze = freeze_mask_flat(params, args.fix_layer)
    optimizer = make_nerf_optimizer(args.lrate, args.lrate_decay,
                                    args.lrate_decay_rate, args.decay_unit,
                                    freeze_mask=freeze)

    pose_cfg = None
    pose_optimizer = None
    pose_params = pose_opt_state = pose_acc = anchors = None
    rest_pose = None
    if args.opt_pose:
        pose_cfg = PoseOptConfig(use_rot6d=args.opt_rot6d,
                                 skel=data_attrs['skel_type'],
                                 multiview=args.multiview)
        pose_optimizer = make_pose_optimizer(
            args.opt_pose_lrate, args.opt_pose_lrate_decay,
            args.opt_pose_decay_rate, args.opt_pose_decay_unit)
        pose_params = init_pose_params(
            data_attrs['kp3d'], data_attrs['bones'], pose_cfg,
            kp_map=data_attrs.get('kp_map'),
            kp_uidxs=data_attrs.get('kp_uidxs'))
        pose_opt_state, pose_acc = init_pose_opt_state(
            pose_optimizer, pose_params)
        anchors = pose_anchor_tree(data_attrs['kp3d'], data_attrs['bones'])
        rp = np.asarray(data_attrs['rest_pose'])
        rest_pose = jnp.asarray(rp[None] if rp.ndim == 2 else rp)
    elif 'rest_pose' in data_attrs:
        rest_pose = jnp.asarray(np.asarray(data_attrs['rest_pose']))

    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=init_opt_state(optimizer, params),
                       pose_params=pose_params,
                       pose_opt_state=pose_opt_state,
                       pose_grad_acc=pose_acc,
                       anchors=anchors)

    start_step = 0
    if not args.no_reload:
        if args.ft_path:
            from anerf_tpu.train.checkpoint import restore_from_path
            restored = restore_from_path(args.ft_path, state)
        else:
            restored = restore_checkpoint(exp_dir, state)
        if restored is not None:
            state = restored
            start_step = int(state.step)
            print(f'resumed from step {start_step}')
            if args.finetune:
                # weights only: reset step + optimizer states
                # (reference raycasters.py:140-142)
                state = dataclasses.replace(
                    state, step=jnp.int32(0),
                    opt_state=init_opt_state(optimizer, state.params))
                start_step = 0

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(args.mesh_shape)

    pose_frozen = (args.opt_pose_stop is not None
                   and start_step >= args.opt_pose_stop)
    tau_fixed = None
    if args.finetune or not args.use_cutoff:
        # finetune keeps the annealed tau (effectively saturated)
        tau_fixed = 2000.0 if args.finetune else None
    rp_idxs = data_attrs.get('rest_pose_idxs')
    step_kwargs = dict(
        pose_frozen=pose_frozen, tau_fixed=tau_fixed,
        rest_pose_idxs=None if rp_idxs is None else jnp.asarray(rp_idxs))
    if args.scan_unroll > 1:
        step_fn = make_train_step_scan(args, cfg, pose_cfg, rest_pose,
                                       optimizer, pose_optimizer,
                                       unroll=args.scan_unroll,
                                       **step_kwargs)
    else:
        step_fn = make_train_step(args, cfg, pose_cfg, rest_pose, optimizer,
                                  pose_optimizer, **step_kwargs)

    return TrainContext(args=args, cfg=cfg, state=state, step_fn=step_fn,
                        loader=loader, data_attrs=data_attrs,
                        render_data=render_data, mesh=mesh,
                        optimizer=optimizer, pose_optimizer=pose_optimizer,
                        pose_cfg=pose_cfg, rest_pose=rest_pose,
                        exp_dir=exp_dir, start_step=start_step)


def run_validation(ctx: TrainContext, step: int,
                   max_images: int = 4,
                   save_images: bool = False) -> Dict[str, float]:
    """Periodic held-out render + PSNR/SSIM (run_nerf.py:555-602).

    save_images dumps rgb / GT / disparity / skeleton-overlay pngs under
    exp_dir/val/<step>/ (the reference writes TB videos instead,
    run_nerf.py:569-600).
    """
    args, rd = ctx.args, ctx.render_data
    n = min(max_images, len(rd['c2ws']))
    tau, _ = derive_schedules(args, ctx.cfg, jnp.int32(step))

    H, W, focals = rd['hwf']
    out = render_path(
        ctx.state.params, ctx.cfg,
        rd['c2ws'][:n], (H[:n], W[:n], focals[:n]),
        rd['kp3d'][:n], rd['skts'][:n], rd['bones'][:n],
        cam_idxs=rd['cam_idxs'][:n] if args.opt_framecode else None,
        centers=None if rd.get('center') is None else rd['center'][:n],
        bgs=rd.get('bgs'), bg_idxs=rd.get('bg_idxs'),
        tau=float(tau), chunk=args.chunk, ext_scale=args.ext_scale,
        use_framecode_idx=args.opt_framecode, mesh=ctx.mesh)

    metrics = evaluate_metric_arrays(out['rgbs'], rd['imgs'][:n],
                                     fgs=rd['fgs'][:n])

    if save_images:
        import imageio.v2 as imageio

        from ..utils.skeleton_draw import draw_skeletons_3d
        val_dir = os.path.join(ctx.exp_dir, 'val', f'{step:08d}')
        os.makedirs(val_dir, exist_ok=True)
        rgbs8 = (np.clip(out['rgbs'], 0, 1) * 255).astype(np.uint8)
        overlays = draw_skeletons_3d(
            rgbs8, rd['kp3d'][:n], rd['c2ws'][:n],
            int(np.atleast_1d(H)[0]), int(np.atleast_1d(W)[0]),
            np.atleast_1d(focals)[:n])
        for i in range(n):
            imageio.imwrite(os.path.join(val_dir, f'rgb_{i:03d}.png'),
                            rgbs8[i])
            imageio.imwrite(os.path.join(val_dir, f'gt_{i:03d}.png'),
                            (np.clip(rd['imgs'][i], 0, 1) * 255).astype(
                                np.uint8))
            disp = out['disps'][i]
            disp = disp / max(disp.max(), 1e-9)
            imageio.imwrite(os.path.join(val_dir, f'disp_{i:03d}.png'),
                            (disp * 255).astype(np.uint8))
            imageio.imwrite(os.path.join(val_dir, f'skel_{i:03d}.png'),
                            overlays[i])
    return metrics


def train(args: TrainConfig, dataset=None,
          n_iters: Optional[int] = None,
          log_fn=None) -> TrainContext:
    """Main training loop. Returns the final context."""
    ctx = setup(args, dataset)
    n_iters = n_iters if n_iters is not None else args.n_iters
    key = jax.random.PRNGKey(args.seed + 1)

    from ..utils.logging import MetricsLogger
    logger = MetricsLogger(ctx.exp_dir)

    ctx.loader.start()
    state = ctx.state
    step_fn = ctx.step_fn
    pose_frozen_rebuilt = False

    unroll = max(1, args.scan_unroll)
    t_start = time.time()
    rays_done = 0
    try:
        for i in range(ctx.start_step, n_iters, unroll):
            # pose freeze threshold crossing: rebuild step fn once
            if (args.opt_pose and not pose_frozen_rebuilt
                    and args.opt_pose_stop is not None
                    and i >= args.opt_pose_stop):
                mk = (make_train_step_scan if unroll > 1
                      else make_train_step)
                kw = {'unroll': unroll} if unroll > 1 else {}
                step_fn = mk(args, ctx.cfg, ctx.pose_cfg, ctx.rest_pose,
                             ctx.optimizer, ctx.pose_optimizer,
                             pose_frozen=True, **kw)
                pose_frozen_rebuilt = True

            # the loader emits pre-stacked unroll-sized super-batches
            # (BatchLoader(stack=unroll)) assembled in its worker threads.
            # (Pre-uploading the next batch with an explicit device_put was
            # measured SLOWER over the axon tunnel — 103k vs 126k rays/s —
            # the eager per-leaf transfers compete with device compute.)
            batch = ctx.loader.next()
            if ctx.mesh is not None:
                batch = shard_ray_batch(ctx.mesh, batch,
                                        stacked=unroll > 1)
            state, out = step_fn(state, batch, jax.random.fold_in(key, i))
            rays_done += args.N_rand * unroll
            done = i + unroll  # steps completed after this dispatch

            start_of_dispatch = i

            def crossed(interval):
                # a multiple of `interval` lies in (start_of_dispatch, done]
                return done // interval > start_of_dispatch // interval
            i = done - 1  # report the last completed step below

            if crossed(args.i_print):
                stats = {k: float(v) for k, v in out['stats'].items()}
                losses = {k: float(v) for k, v in out['losses'].items()}
                dt = time.time() - t_start
                rec = {'rays_per_sec': rays_done / dt, **losses, **stats}
                logger.log_scalars(i + 1, rec)
                if log_fn:
                    log_fn({'step': i + 1, **rec})
                else:
                    print(f"[{i + 1}] loss={losses['total_loss']:.4f} "
                          f"psnr={stats.get('psnr', 0):.2f} "
                          f"rays/s={rec['rays_per_sec']:.0f}")

            if crossed(args.i_weights):
                ctx.state = state
                save_checkpoint(ctx.exp_dir, state, i + 1)
            if args.opt_pose and crossed(args.i_pose_weights):
                ctx.state = state
                save_pose_checkpoint(ctx.exp_dir, state, i + 1)
            if crossed(args.i_testset):
                ctx.state = state
                val = run_validation(ctx, i + 1, save_images=True)
                logger.log_scalars(i + 1, val, prefix='val/')
                print(f'[val {i + 1}] ' + ' '.join(
                    f'{k}={v:.3f}' for k, v in val.items()))
    finally:
        ctx.loader.stop()
        logger.close()

    ctx.state = state
    return ctx
