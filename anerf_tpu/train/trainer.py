"""The jitted train step: render -> losses -> dual optimizer update.

TPU re-design of reference core/trainer.py:205-483. One `train_step(state,
batch, key)` is traced once: pose FK, rendering, losses, both Adam updates
(the pose Adam applies on its opt_pose_step interval via branch-free masked
selection, matching the reference's gradient-accumulation-between-steps
semantics, trainer.py:451-483). Rays are sharded over the mesh 'data' axis;
params are replicated and jit's partitioner emits the gradient all-reduce.

Batch contract (all static shapes; R rays, NI images per batch):
  rays        (R, 11)  packed [o, d, near, far, viewdirs]
  target_s    (R, 3)   ground-truth pixels
  fgs         (R, 1)   foreground mask values
  bgs         (R, 3)   background pixels (or ones)
  cam_idxs    (R,)     camera/frame index per ray (framecodes)
  pose_idx    (R,)     image-slot per ray, indexes the per-image tables
  kp_idxs     (NI,)    global frame index per image slot (pose-opt lookup)
  kp3d/bones/skts/cyls (NI, ...) per-image pose tables (non-popt path)
  temp_val    (NI,)    temporal-validity (only when use_temp_loss)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..ops.embedder import alpha_schedule, tau_schedule
from ..ops.rotations import rot_to_rot6d
from ..pose.pose_opt import PoseOptConfig, fk_lookup
from ..render.raycaster import RenderConfig, render_rays
from .losses import get_loss_fn, get_reg_fn, img2psnr
from .state import TrainState, grad_norms, tree_select


def derive_schedules(args: TrainConfig, cfg: RenderConfig, step: jnp.ndarray,
                     tau_fixed: Optional[float] = None):
    """tau + freq-schedule alpha for the current step."""
    if tau_fixed is not None:
        tau = jnp.float32(tau_fixed)
    else:
        tau = tau_schedule(cfg.embed_kp, step, args.cutoff_step,
                           args.cutoff_rate)
    alpha = None
    if cfg.embed_kp.freq_schedule:
        alpha = alpha_schedule(cfg.embed_kp, step, args.freq_schedule_step,
                               float(args.multires - 1))
    return tau, alpha


def _gather_pose_for_rays(tables: Dict[str, jnp.ndarray],
                          pose_idx: jnp.ndarray,
                          n_rays: int) -> Dict[str, jnp.ndarray]:
    """Per-image tables -> per-ray rows.

    The sampler always emits equal contiguous ray blocks per image
    (pose_idx = repeat(arange(NI), R/NI)), so the gather is a structured
    tile: use jnp.repeat, whose transpose is a segment-sum — far cheaper on
    TPU than the scatter-add an arbitrary-index gather's backward lowers to
    (the pose gradient flows through these rows).
    """
    n_img = None
    for v in tables.values():
        if v is not None:
            n_img = v.shape[0]
            break
    if n_img is not None and n_rays % n_img == 0:
        rep = n_rays // n_img
        return {k: jnp.repeat(v, rep, axis=0) if v is not None else None
                for k, v in tables.items()}
    return {k: v[pose_idx] if v is not None else None
            for k, v in tables.items()}


def compute_nerf_loss(args: TrainConfig, batch, rgb_pred, acc_pred,
                      coarse: bool = False):
    """RGB + optional occupancy regularization (trainer.py:353-380)."""
    loss_fn = get_loss_fn(args.loss_fn, args.loss_beta)
    reg_fn = get_reg_fn(args.reg_fn)

    bgs = batch.get('bgs')
    if args.use_background and bgs is not None:
        rgb_pred = rgb_pred + (1.0 - acc_pred)[..., None] * bgs
    rgb_loss = loss_fn(rgb_pred, batch['target_s'], reduction='mean')
    if coarse:
        rgb_loss = rgb_loss * args.coarse_weight
    psnr = img2psnr(jax.lax.stop_gradient(rgb_pred), batch['target_s'])

    suffix = '0' if coarse else ''
    losses = {f'rgb_loss{suffix}': rgb_loss}
    stats = {f'psnr{suffix}': psnr}
    if reg_fn is not None:
        losses[f'reg_loss{suffix}'] = reg_fn(
            acc_pred, batch['fgs'][..., 0], reduction='off') * args.reg_coef
    return losses, stats


def compute_kp_loss(args: TrainConfig, pose_cfg: PoseOptConfig,
                    anchors: Dict[str, jnp.ndarray],
                    kp_idxs: jnp.ndarray,
                    kps: jnp.ndarray, bones: jnp.ndarray, rots: jnp.ndarray,
                    temp: Optional[Dict[str, jnp.ndarray]] = None):
    """Anchor hinge regularization + optional temporal smoothness
    (trainer.py:382-441). All per-image (NI, ...) quantities."""
    if args.opt_rot6d:
        reg_bones = rot_to_rot6d(anchors['rots'][kp_idxs])
        bones_cmp = rot_to_rot6d(rots)
    else:
        reg_bones = anchors['bones'][kp_idxs]
        bones_cmp = bones

    tol = args.opt_pose_tol
    kp_loss = (reg_bones - bones_cmp) ** 2
    kp_loss = kp_loss[:, 1:]  # exclude root
    mask = (kp_loss > tol).astype(kp_loss.dtype)
    kp_loss = (jnp.where(mask > 0, kp_loss - tol, 0.0)).sum(-1)
    kp_loss = kp_loss.mean() * args.opt_pose_coef

    losses = {'kp_loss': kp_loss}
    if args.use_temp_loss and temp is not None:
        prev_bones = jax.lax.stop_gradient(temp['prev_bones'])
        next_bones = jax.lax.stop_gradient(temp['next_bones'])
        prev_kps = jax.lax.stop_gradient(temp['prev_kps'])
        next_kps = jax.lax.stop_gradient(temp['next_kps'])
        temp_val = temp['temp_val']
        ang_vel = ((bones_cmp - prev_bones)
                   - (next_bones - bones_cmp)) ** 2
        joint_vel = ((kps - prev_kps) - (next_kps - kps)) ** 2
        temp_loss = (ang_vel.sum(-1) + joint_vel.sum(-1)) * temp_val[..., None]
        losses['temp_loss'] = temp_loss.mean() * args.temp_coef

    pjpc = jnp.sqrt(((anchors['kps'][kp_idxs]
                      - jax.lax.stop_gradient(kps)) ** 2).sum(-1))
    mpjpc = pjpc.mean() / args.ext_scale
    return losses, {'MPJPC': mpjpc}


def make_train_step(args: TrainConfig,
                    cfg: RenderConfig,
                    pose_cfg: Optional[PoseOptConfig],
                    rest_pose: Optional[jnp.ndarray],
                    optimizer: optax.GradientTransformation,
                    pose_optimizer: Optional[optax.GradientTransformation],
                    pose_frozen: bool = False,
                    tau_fixed: Optional[float] = None,
                    kp_map: Optional[jnp.ndarray] = None,
                    rest_pose_idxs: Optional[jnp.ndarray] = None,
                    donate: bool = True,
                    raw: bool = False):
    """Build the jitted train step.

    pose_frozen: static flag — True after opt_pose_stop (the loop rebuilds
    the step fn once when crossing the threshold), detaching pose params
    from the graph (reference popt_detach, trainer.py:240).
    """
    use_pose = pose_cfg is not None and not pose_frozen and args.opt_pose

    def loss_fn(params, pose_params, batch, key, step):
        tau, alpha = derive_schedules(args, cfg, step, tau_fixed)

        if pose_cfg is not None:
            # FK over the batch's per-image frame indices
            pp = pose_params if use_pose \
                else jax.lax.stop_gradient(pose_params)
            kps_i, bones_i, skts_i, _, rots_i = fk_lookup(
                pp, batch['kp_idxs'], rest_pose, pose_cfg, kp_map,
                rest_pose_idxs)
            tables = {'kp3d': kps_i, 'bones': bones_i, 'skts': skts_i,
                      'cyls': batch['cyls']}
        else:
            kps_i = bones_i = rots_i = None
            tables = {'kp3d': batch['kp3d'], 'bones': batch['bones'],
                      'skts': batch['skts'], 'cyls': batch['cyls']}

        per_ray = _gather_pose_for_rays(tables, batch['pose_idx'],
                                        batch['rays'].shape[0])

        preds = render_rays(
            params, cfg, batch['rays'], per_ray['kp3d'], per_ray['skts'],
            per_ray['bones'], per_ray['cyls'],
            cam_idxs=batch.get('cam_idxs') if args.opt_framecode else None,
            rng=key, tau=tau, alpha_sched=alpha)

        losses, stats = compute_nerf_loss(args, batch, preds['rgb_map'],
                                          preds['acc_map'])
        if 'rgb0' in preds:
            l0, s0 = compute_nerf_loss(args, batch, preds['rgb0'],
                                       preds['acc0'], coarse=True)
            losses.update(l0)
            stats.update(s0)

        if use_pose:
            temp = None
            if args.use_temp_loss:
                n_frames = pose_params['pelvis'].shape[0]
                prev_idx = (batch['kp_idxs'] - 1) % n_frames
                next_idx = (batch['kp_idxs'] + 1) % n_frames
                pk, pb, _, _, pr = fk_lookup(pose_params, prev_idx, rest_pose,
                                             pose_cfg, kp_map,
                                             rest_pose_idxs)
                nk, nb, _, _, nr = fk_lookup(pose_params, next_idx, rest_pose,
                                             pose_cfg, kp_map,
                                             rest_pose_idxs)
                if args.opt_rot6d:
                    pb, nb = rot_to_rot6d(pr), rot_to_rot6d(nr)
                temp = {'prev_bones': pb, 'next_bones': nb,
                        'prev_kps': pk, 'next_kps': nk,
                        'temp_val': batch['temp_val']}
            kl, ks = compute_kp_loss(args, pose_cfg, batch['anchors'],
                                     batch['kp_idxs'], kps_i, bones_i,
                                     rots_i, temp)
            losses.update(kl)
            stats.update(ks)

        total = jnp.float32(0.0)
        for v in losses.values():
            total = total + v
        losses['total_loss'] = total
        stats['alpha'] = jnp.mean(preds['acc_map'])
        return total, (losses, stats)

    def train_step(state: TrainState, batch: Dict[str, Any], key: jax.Array
                   ) -> Tuple[TrainState, Dict[str, Any]]:
        batch = dict(batch)
        if state.anchors is not None:
            batch['anchors'] = state.anchors

        if use_pose:
            (loss, (losses, stats)), (grads, pose_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.pose_params, batch, key, state.step)
        else:
            (loss, (losses, stats)), grads = jax.value_and_grad(
                loss_fn, argnums=0, has_aux=True)(
                    state.params, state.pose_params, batch, key, state.step)
            pose_grads = None

        # cutoff_dist is never trained (reference cutoff_embedder.py:91-92)
        grads = dict(grads)
        grads['cutoff_dist'] = jnp.zeros_like(state.params['cutoff_dist'])

        total_norm, avg_norm = grad_norms(grads)
        # Adam over one flattened vector: the param tree has ~50 small
        # leaves; per-leaf update kernels cost more in launches than FLOPs
        from jax.flatten_util import ravel_pytree
        flat_g, _ = ravel_pytree(grads)
        flat_p, unravel_p = ravel_pytree(state.params)
        updates, new_opt_state = optimizer.update(flat_g, state.opt_state,
                                                  flat_p)
        new_params = unravel_p(flat_p + updates)

        new_pose_params = state.pose_params
        new_pose_opt_state = state.pose_opt_state
        new_acc = state.pose_grad_acc
        if use_pose:
            # The pose trees are tiny (N_frames x 75 floats); per-leaf optax
            # ops + masked selects cost more in kernel-launch count than in
            # FLOPs, so run the optimizer over ONE flattened vector.
            from jax.flatten_util import ravel_pytree
            flat_grads, unravel = ravel_pytree(pose_grads)
            flat_params, _ = ravel_pytree(state.pose_params)
            acc = state.pose_grad_acc + flat_grads
            do_step = (state.step % args.opt_pose_step) == 0
            if args.opt_pose_warmup:
                # poses frozen until the field has formed
                # (reference: core/pose_opt.py:631 — optimize only at
                # i >= opt_pose_warmup; warmup grads are DROPPED, not
                # accumulated, matching "not optimized at all")
                warm_done = state.step >= args.opt_pose_warmup
                do_step = jnp.logical_and(do_step, warm_done)
                acc = jnp.where(warm_done, acc, jnp.zeros_like(acc))
            p_updates, p_opt_state = pose_optimizer.update(
                acc, state.pose_opt_state, flat_params)
            mask = do_step.astype(flat_params.dtype)
            new_pose_params = unravel(flat_params + mask * p_updates)
            new_pose_opt_state = tree_select(do_step, p_opt_state,
                                             state.pose_opt_state)
            new_acc = (1.0 - mask) * acc

        stats = dict(stats)
        stats['total_norm'] = total_norm
        stats['avg_norm'] = avg_norm

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            pose_params=new_pose_params,
            pose_opt_state=new_pose_opt_state,
            pose_grad_acc=new_acc,
            anchors=state.anchors)
        return new_state, {'losses': losses, 'stats': stats}

    if raw:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_step_scan(*args_mk, unroll: int = 8, donate: bool = True,
                         **kwargs_mk):
    """Multi-step train function: scans `unroll` batches in ONE dispatch.

    Per-call dispatch latency (host->device command issue; severe over
    remote-attached TPUs) is amortized across `unroll` optimizer steps.
    Takes stacked batches {k: (unroll, ...)} and returns the last step's
    losses/stats. Semantically identical to calling the single step
    `unroll` times.
    """
    kwargs_mk = dict(kwargs_mk)
    kwargs_mk['raw'] = True
    inner_fn = make_train_step(*args_mk, **kwargs_mk)

    def scan_step(state: TrainState, batches: Dict[str, Any], key: jax.Array
                  ) -> Tuple[TrainState, Dict[str, Any]]:
        def body(st, i):
            batch = {k: (v[i] if v is not None else None)
                     for k, v in batches.items()}
            st, out = inner_fn(st, batch, jax.random.fold_in(key, i))
            return st, out
        state, outs = jax.lax.scan(body, state, jnp.arange(unroll))
        last = jax.tree_util.tree_map(lambda x: x[-1], outs)
        return state, last

    return jax.jit(scan_step, donate_argnums=(0,) if donate else ())


def stack_batches(batches):
    """Stack a list of batch dicts along a new leading axis (host-side)."""
    import numpy as np
    keys = batches[0].keys()
    return {k: (np.stack([np.asarray(b[k]) for b in batches])
                if batches[0][k] is not None else None) for k in keys}


def make_render_step(args: TrainConfig, cfg: RenderConfig):
    """Jitted no-grad render of a fixed-size ray bucket (for val/render)."""
    test_cfg = cfg.test_mode()

    @jax.jit
    def render_step(params, rays, kp3d, skts, bones, cyls, cam_idxs, tau):
        return render_rays(params, test_cfg, rays, kp3d, skts, bones, cyls,
                           cam_idxs=cam_idxs if args.opt_framecode else None,
                           rng=None, tau=tau,
                           eval_framecode_mean=False)
    return render_step
