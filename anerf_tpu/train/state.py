"""TrainState pytree and optimizer construction.

The reference carries state across two torch Adam optimizers, module buffers,
and a pose layer (SURVEY §5 checkpoint); here everything lives in one
registered dataclass pytree that flows through the jitted train step and is
checkpointed wholesale with orbax.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray                      # int32 scalar
    params: Dict[str, Any]                 # {'coarse','fine','cutoff_dist'}
    opt_state: Any
    pose_params: Optional[Dict[str, Any]]  # {'pelvis','bones',...} or None
    pose_opt_state: Optional[Any]
    pose_grad_acc: Optional[Dict[str, Any]]
    anchors: Optional[Dict[str, Any]]      # {'kps','bones','rots'}


def decay_schedule(lrate: float, lrate_decay: int, decay_rate: float,
                   decay_unit: int):
    """LR schedule matching reference decay_optimizer_lrate
    (core/trainer.py:173-183): lr = lrate * rate^((count // unit) / decay).

    Note the floor-div by decay_unit: decay happens in steps of decay_unit.
    """
    def sched(count):
        unit_count = count // decay_unit
        return lrate * decay_rate ** (unit_count / float(lrate_decay))
    return sched


def freeze_mask_flat(params: Dict[str, Any], fix_layer: int) -> jnp.ndarray:
    """Flat 0/1 mask over the raveled params: 0 for the first `fix_layer`
    density-trunk layers of every network (reference fix_layer finetune
    freezing, core/raycasters.py:215-217), 1 elsewhere.
    """
    from jax.flatten_util import ravel_pytree

    mask = jax.tree_util.tree_map(
        lambda x: jnp.ones(jnp.shape(x), jnp.float32), params)
    for net in mask:
        if isinstance(mask[net], dict) and 'pts_linears' in mask[net]:
            layers = mask[net]['pts_linears']
            for i in range(min(int(fix_layer), len(layers))):
                layers[i] = jax.tree_util.tree_map(
                    jnp.zeros_like, layers[i])
    flat, _ = ravel_pytree(mask)
    return flat


def make_nerf_optimizer(lrate: float, lrate_decay: int, decay_rate: float,
                        decay_unit: int,
                        freeze_mask: Optional[jnp.ndarray] = None
                        ) -> optax.GradientTransformation:
    opt = optax.adam(
        learning_rate=decay_schedule(lrate, lrate_decay, decay_rate,
                                     decay_unit),
        b1=0.9, b2=0.999, eps=1e-8)
    if freeze_mask is None:
        return opt
    # Zero the post-Adam update on frozen entries; operates on the
    # flattened vector the optimizer runs over (see init_opt_state).
    zero_frozen = optax.GradientTransformation(
        init=lambda params: optax.EmptyState(),
        update=lambda updates, state, params=None: (
            updates * freeze_mask, state))
    return optax.chain(opt, zero_frozen)


def make_pose_optimizer(lrate: float, lrate_decay: int, decay_rate: float,
                        decay_unit: int) -> optax.GradientTransformation:
    return optax.adam(
        learning_rate=decay_schedule(lrate, lrate_decay, decay_rate,
                                     decay_unit),
        b1=0.9, b2=0.999, eps=1e-8)


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def init_opt_state(optimizer, params):
    """Optimizer state over the FLATTENED param vector (see trainer.py)."""
    from jax.flatten_util import ravel_pytree
    flat, _ = ravel_pytree(params)
    return optimizer.init(flat)


def init_pose_opt_state(pose_optimizer, pose_params):
    """(opt_state, grad_acc) over the FLATTENED pose vector — the trainer
    runs the pose optimizer on one concatenated array (see trainer.py)."""
    from jax.flatten_util import ravel_pytree
    flat, _ = ravel_pytree(pose_params)
    return pose_optimizer.init(flat), jnp.zeros_like(flat)


def tree_select(pred, a, b):
    """Elementwise pytree where(pred, a, b) with scalar pred."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def global_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves))) if leaves else jnp.float32(0)


def grad_norms(tree):
    """(total_norm, avg_norm) as in reference get_gradnorm
    (trainer.py:191-203): avg over per-tensor norms."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.float32(0), jnp.float32(0)
    sq = jnp.stack([jnp.sum(jnp.square(x)) for x in leaves])
    total = jnp.sqrt(jnp.sum(sq))
    avg = jnp.sqrt(jnp.sum(sq) / len(leaves))
    return total, avg
