"""Scanned multi-step trainer equals repeated single steps."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anerf_tpu.train.trainer import (make_train_step, make_train_step_scan,
                                     stack_batches)

from helpers import build_tiny, synthetic_batch
from test_train_step import make_state


def test_scan_matches_single_steps(rng):
    args, cfg, params, pose = build_tiny(rng, raw_noise_std=0.0, perturb=0.0)
    state1, opt, _ = make_state(args, params)
    state2, opt2, _ = make_state(args, params)
    key = jax.random.PRNGKey(5)
    unroll = 4

    batches = [synthetic_batch(rng, pose) for _ in range(unroll)]

    single = make_train_step(args, cfg, None, None, opt, None, donate=False)
    s = state1
    for i in range(unroll):
        s, out_single = single(s, batches[i], jax.random.fold_in(key, i))

    scan = make_train_step_scan(args, cfg, None, None, opt2, None,
                                unroll=unroll, donate=False)
    s2, out_scan = scan(state2, stack_batches(batches), key)

    assert int(s2.step) == int(s.step) == unroll
    np.testing.assert_allclose(
        float(out_scan['losses']['total_loss']),
        float(out_single['losses']['total_loss']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scan_with_pose_opt(rng):
    from anerf_tpu.pose.pose_opt import PoseOptConfig
    args, cfg, params, pose = build_tiny(
        rng, opt_pose=True, opt_pose_step=2, opt_pose_coef=0.5,
        raw_noise_std=0.0, perturb=0.0)
    pose_cfg = PoseOptConfig()
    state, opt, popt = make_state(args, params, pose, pose_cfg)
    rest = jnp.asarray(pose['rest_pose'])
    unroll = 4
    scan = make_train_step_scan(args, cfg, pose_cfg, rest, opt, popt,
                                unroll=unroll, donate=False)
    batches = stack_batches([synthetic_batch(rng, pose)
                             for _ in range(unroll)])
    p0 = np.asarray(state.pose_params['pelvis']).copy()
    state, out = scan(state, batches, jax.random.PRNGKey(0))
    assert int(state.step) == unroll
    assert 'kp_loss' in out['losses']
    # pose stepped at least once (steps 0 and 2 hit the interval)
    assert not np.allclose(np.asarray(state.pose_params['pelvis']), p0)
