"""Checkpoint save/restore with orbax.

The logical contents mirror the reference's monolithic .tar (SURVEY §5):
global_step, NeRF params (coarse/fine), embedder state (cutoff_dist; tau is
derived from step), both optimizer states, pose params + pose optimizer +
anchors. Auto-resume picks the latest step in the experiment dir
(reference raycasters.py:124-142); `finetune` loads weights but resets
step/optimizer (cutoff_embedder.py:233-236).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _ckpt_dir(exp_dir: str) -> str:
    return os.path.join(os.path.abspath(exp_dir), 'checkpoints')


def save_checkpoint(exp_dir: str, state: TrainState, step: int,
                    keep: int = 3) -> str:
    path = _ckpt_dir(exp_dir)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                       create=True)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return os.path.join(path, str(step))


def latest_checkpoint_step(exp_dir: str) -> Optional[int]:
    path = _ckpt_dir(exp_dir)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()


def restore_checkpoint(exp_dir: str, target: TrainState,
                       step: Optional[int] = None) -> Optional[TrainState]:
    """Restore into the structure of `target` (abstract pytree)."""
    path = _ckpt_dir(exp_dir)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          target)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_from_path(path: str, target: TrainState
                      ) -> Optional[TrainState]:
    """Restore from an explicit path (--ft_path, reference
    raycasters.py:125-126: ft_path replaces the expdir ckpt search).

    Accepts an experiment dir (containing checkpoints/), a checkpoints
    dir, a specific step dir, or a reference torch .tar (weights only).
    """
    if path.endswith('.tar'):
        import dataclasses

        import jax.numpy as jnp

        from ..pose.ckpt_compat import load_reference_checkpoint
        params, extras = load_reference_checkpoint(path)
        step = int(extras.get('global_step') or 0)
        return dataclasses.replace(target, params=params,
                                   step=jnp.int32(step))
    import dataclasses

    import jax.numpy as jnp

    p = os.path.abspath(path)
    step = None
    if os.path.basename(p).isdigit():
        step, p = int(os.path.basename(p)), os.path.dirname(p)
    elif os.path.isdir(os.path.join(p, 'checkpoints')):
        p = os.path.join(p, 'checkpoints')
    if not os.path.isdir(p):
        raise FileNotFoundError(f'--ft_path checkpoint not found: {path}')
    # Raw restore + weights-only merge: the source run's optimizer layout
    # may differ from this run's (e.g. fix_layer chains a mask transform),
    # and ft_path semantics only promise weights anyway.
    with ocp.CheckpointManager(p) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None
        raw = mgr.restore(step)

    def merge(t, r, what):
        if r is None:
            return t
        try:
            return jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b, jnp.asarray(a).dtype), t, r)
        except ValueError as e:
            raise ValueError(
                f'--ft_path {path}: checkpoint {what} tree does not match '
                f'this run\'s model config') from e

    out = dataclasses.replace(
        target,
        step=jnp.int32(int(np.asarray(raw['step']))),
        params=merge(target.params, raw.get('params'), 'params'))
    if target.pose_params is not None and raw.get('pose_params') is not None:
        out = dataclasses.replace(
            out,
            pose_params=merge(target.pose_params, raw['pose_params'],
                              'pose_params'),
            anchors=merge(target.anchors, raw.get('anchors'), 'anchors'))
    return out


def save_pose_checkpoint(exp_dir: str, state: TrainState, step: int) -> str:
    """Pose-only snapshot (reference save_popt, trainer.py:508-516)."""
    path = os.path.join(os.path.abspath(exp_dir), 'pose_checkpoints',
                        f'{step:08d}')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        'global_step': step,
        'pose_params': jax.tree_util.tree_map(np.asarray, state.pose_params),
        'anchors': jax.tree_util.tree_map(np.asarray, state.anchors),
    }
    np.savez(path + '.npz', **_flatten(payload))
    return path + '.npz'


def _flatten(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}/'))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def load_pose_checkpoint(path: str):
    """Load a pose-only snapshot back into nested dicts."""
    flat = dict(np.load(path))
    out: dict = {}
    for k, v in flat.items():
        parts = k.split('/')
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out
