"""Train-step tests: loss decreases, pose-opt stepping semantics, sharding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from anerf_tpu.pose.pose_opt import (PoseOptConfig, init_pose_params,
                                     pose_anchor_tree)
from anerf_tpu.train.state import (TrainState, init_opt_state,
                                   init_pose_opt_state,
                                   make_nerf_optimizer,
                                   make_pose_optimizer)
from anerf_tpu.train.trainer import make_train_step

from helpers import build_tiny, synthetic_batch


def make_state(args, params, pose=None, pose_cfg=None):
    opt = make_nerf_optimizer(args.lrate, args.lrate_decay,
                              args.lrate_decay_rate, args.decay_unit)
    popt = None
    pose_params = pose_opt_state = pose_acc = anchors = None
    if pose is not None:
        popt = make_pose_optimizer(args.opt_pose_lrate,
                                   args.opt_pose_lrate_decay,
                                   args.opt_pose_decay_rate,
                                   args.opt_pose_decay_unit)
        pose_params = init_pose_params(pose['kp3d'], pose['bones'], pose_cfg)
        pose_opt_state, pose_acc = init_pose_opt_state(popt, pose_params)
        anchors = pose_anchor_tree(pose['kp3d'], pose['bones'])
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=init_opt_state(opt, params),
                       pose_params=pose_params,
                       pose_opt_state=pose_opt_state,
                       pose_grad_acc=pose_acc, anchors=anchors)
    return state, opt, popt


def test_train_step_decreases_loss(rng):
    args, cfg, params, pose = build_tiny(rng)
    state, opt, _ = make_state(args, params)
    step_fn = make_train_step(args, cfg, None, None, opt, None, donate=False)
    batch = synthetic_batch(rng, pose)
    # a learnable target: constant mid-gray
    batch['target_s'] = jnp.full_like(batch['target_s'], 0.3)
    key = jax.random.PRNGKey(0)

    losses = []
    for i in range(30):
        state, out = step_fn(state, batch, jax.random.fold_in(key, i))
        losses.append(float(out['losses']['total_loss']))
    assert int(state.step) == 30
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 1e-3, losses


def test_train_step_pose_opt(rng):
    args, cfg, params, pose = build_tiny(
        rng, opt_pose=True, opt_pose_step=4, opt_pose_coef=0.5,
        opt_pose_lrate=1e-3, opt_rot6d=False, use_temp_loss=True,
        temp_coef=0.01)
    pose_cfg = PoseOptConfig(use_rot6d=False)
    state, opt, popt = make_state(args, params, pose, pose_cfg)
    rest = jnp.asarray(pose['rest_pose'])
    step_fn = make_train_step(args, cfg, pose_cfg, rest, opt, popt,
                              donate=False)
    batch = synthetic_batch(rng, pose)
    key = jax.random.PRNGKey(1)

    pelvis0 = np.asarray(state.pose_params['pelvis']).copy()
    states = [state]
    for i in range(6):
        state, out = step_fn(state, batch, jax.random.fold_in(key, i))
        states.append(state)
    assert 'kp_loss' in out['losses'] and 'temp_loss' in out['losses']
    assert 'MPJPC' in out['stats']

    # pose params step only on the opt_pose_step interval (step 0 and 4)
    p0 = np.asarray(states[0].pose_params['pelvis'])
    p1 = np.asarray(states[1].pose_params['pelvis'])  # after step 0: stepped
    p2 = np.asarray(states[2].pose_params['pelvis'])  # step 1: no update
    p5 = np.asarray(states[5].pose_params['pelvis'])  # after step 4: stepped
    assert not np.allclose(p0, p1)
    np.testing.assert_array_equal(p1, p2)
    assert not np.allclose(p2, p5)
    # only batch frames move
    touched = np.asarray(batch['kp_idxs'])
    untouched = np.setdiff1d(np.arange(len(pelvis0)), touched)
    np.testing.assert_array_equal(p5[untouched], pelvis0[untouched])


def test_train_step_pose_warmup(rng):
    """opt_pose_warmup freezes poses (and drops their grads — reference
    semantics, core/pose_opt.py:631: not optimized at all during warmup)
    until step >= warmup, then the normal interval mask resumes."""
    args, cfg, params, pose = build_tiny(
        rng, opt_pose=True, opt_pose_step=2, opt_pose_warmup=4,
        opt_pose_lrate=1e-3, opt_rot6d=False)
    pose_cfg = PoseOptConfig(use_rot6d=False)
    state, opt, popt = make_state(args, params, pose, pose_cfg)
    rest = jnp.asarray(pose['rest_pose'])
    step_fn = make_train_step(args, cfg, pose_cfg, rest, opt, popt,
                              donate=False)
    batch = synthetic_batch(rng, pose)
    key = jax.random.PRNGKey(1)

    p0 = np.asarray(state.pose_params['pelvis']).copy()
    states = [state]
    for i in range(7):
        state, _ = step_fn(state, batch, jax.random.fold_in(key, i))
        states.append(state)
    # steps 0-3 are warmup: pose params must not move even on the
    # opt_pose_step interval (steps 0 and 2), and no grads accumulate
    for k in range(1, 5):
        np.testing.assert_array_equal(
            np.asarray(states[k].pose_params['pelvis']), p0)
        assert float(np.abs(np.asarray(
            states[k].pose_grad_acc)).max()) == 0.0
    # step 4 is the first post-warmup interval hit: poses move
    assert not np.allclose(
        np.asarray(states[5].pose_params['pelvis']), p0)


def test_train_step_pose_frozen(rng):
    args, cfg, params, pose = build_tiny(rng, opt_pose=True, opt_pose_step=1)
    pose_cfg = PoseOptConfig()
    state, opt, popt = make_state(args, params, pose, pose_cfg)
    rest = jnp.asarray(pose['rest_pose'])
    step_fn = make_train_step(args, cfg, pose_cfg, rest, opt, popt,
                              pose_frozen=True, donate=False)
    batch = synthetic_batch(rng, pose)
    p0 = np.asarray(state.pose_params['pelvis']).copy()
    state, out = step_fn(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(state.pose_params['pelvis']), p0)
    assert 'kp_loss' not in out['losses']


def test_cutoff_dist_not_trained(rng):
    args, cfg, params, pose = build_tiny(rng)
    state, opt, _ = make_state(args, params)
    step_fn = make_train_step(args, cfg, None, None, opt, None, donate=False)
    batch = synthetic_batch(rng, pose)
    c0 = np.asarray(state.params['cutoff_dist']).copy()
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(state.params['cutoff_dist']), c0)


def test_train_step_sharded_matches_single(rng):
    """The sharded step must produce the same numbers as the unsharded one."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from anerf_tpu.parallel.mesh import make_mesh, shard_ray_batch

    assert len(jax.devices()) >= 8, 'conftest must set 8 CPU devices'
    args, cfg, params, pose = build_tiny(rng, raw_noise_std=0.0, perturb=0.0)
    state, opt, _ = make_state(args, params)
    step_fn = make_train_step(args, cfg, None, None, opt, None, donate=False)
    batch = synthetic_batch(rng, pose, n_rays=64, n_images=4)
    key = jax.random.PRNGKey(7)

    s_plain, out_plain = step_fn(state, batch, key)

    mesh = make_mesh(8)
    sharded_batch = shard_ray_batch(mesh, batch)
    state2, opt2, _ = make_state(args, params)
    s_shard, out_shard = step_fn(state2, sharded_batch, key)

    np.testing.assert_allclose(
        float(out_plain['losses']['total_loss']),
        float(out_shard['losses']['total_loss']), rtol=2e-5)
    lp = jax.tree_util.tree_leaves(s_plain.params)
    ls = jax.tree_util.tree_leaves(s_shard.params)
    for a, b in zip(lp, ls):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_fast_grads(rng):
    """Opt-in bf16-cotangent path: step runs, loss finite and decreasing."""
    args, cfg, params, pose = build_tiny(rng, compute_dtype='bfloat16',
                                         fast_grads=True)
    assert cfg.fast_grads
    state, opt, _ = make_state(args, params)
    step_fn = make_train_step(args, cfg, None, None, opt, None, donate=False)
    batch = synthetic_batch(rng, pose)
    batch['target_s'] = jnp.full_like(batch['target_s'], 0.3)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(20):
        state, out = step_fn(state, batch, jax.random.fold_in(key, i))
        losses.append(float(out['losses']['total_loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_fix_layer_freezes_trunk(rng):
    """finetune + fix_layer freezes the first density-trunk layers of every
    net while the rest train (reference core/raycasters.py:215-217)."""
    from anerf_tpu.train.state import freeze_mask_flat

    # raw_noise_std>0 keeps relu-density gradients alive at cold init (at
    # noise=0 an unlucky init leaves the fine net's sigma all-negative and
    # relu kills its gradient exactly — same property as the reference)
    args, cfg, params, pose = build_tiny(rng, raw_noise_std=1.0)
    freeze = freeze_mask_flat(params, fix_layer=2)
    opt = make_nerf_optimizer(args.lrate, args.lrate_decay,
                              args.lrate_decay_rate, args.decay_unit,
                              freeze_mask=freeze)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=init_opt_state(opt, params),
                       pose_params=None, pose_opt_state=None,
                       pose_grad_acc=None, anchors=None)
    step_fn = make_train_step(args, cfg, None, None, opt, None, donate=False)
    batch = synthetic_batch(rng, pose)
    key = jax.random.PRNGKey(0)

    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    for i in range(3):
        state, _ = step_fn(state, batch, jax.random.fold_in(key, i))
    p1 = state.params

    for net in ('coarse', 'fine'):
        if p1[net] is None:
            continue
        for i in range(2):
            np.testing.assert_array_equal(
                np.asarray(p1[net]['pts_linears'][i]['w']),
                p0[net]['pts_linears'][i]['w'])
        # a later trunk layer and the heads must have moved
        assert not np.array_equal(
            np.asarray(p1[net]['pts_linears'][2]['w']),
            p0[net]['pts_linears'][2]['w'])
        assert not np.array_equal(np.asarray(p1[net]['rgb_linear']['w']),
                                  p0[net]['rgb_linear']['w'])
