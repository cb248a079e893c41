"""Differentiable forward kinematics, level-parallel, pure jnp.

Re-design of the reference FK (core/pose_opt.py:372-521 and
core/utils/skeleton_utils.py:334-376). Instead of a hand-unrolled 8-stage
chain specific to SMPL, joints are grouped by tree depth (Skeleton.levels)
and each level is one batched (N, L, 4, 4) matmul against gathered parent
transforms. Levels are static at trace time, so XLA sees a fixed sequence of
small batched matmuls — the same schedule as the reference's unrolled chain,
but derived for any skeleton.

The rigid inverse (R^T, -R^T t) replaces the reference's torch.inverse on the
full 4x4 (pose_opt.py:435): cheaper, exact for rigid transforms, and with
well-behaved gradients.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..skeleton import Skeleton, SMPLSkeleton
from .rotations import bones_to_rot


def rigid_inverse(mats: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid homogeneous transforms (..., 4, 4) without a solver."""
    rot = mats[..., :3, :3]
    t = mats[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate(
        [rot_t, -jnp.matmul(rot_t, t, precision='highest')], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=mats.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def _to_homo(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4)."""
    top = jnp.concatenate([rot, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def fk(bones: jnp.ndarray,
       rest_pose: jnp.ndarray,
       pelvis: jnp.ndarray | None = None,
       skel: Skeleton = SMPLSkeleton,
       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward kinematics.

    Args:
      bones: (N, J, 3) axis-angle or (N, J, 6) 6D per-joint local rotations.
      rest_pose: (J, 3) or (N, J, 3) canonical joint locations.
      pelvis: optional (N, 3) world translation added to every joint
        (reference adds it to l2ws post-chain, pose_opt.py:423-432).
      skel: skeleton definition (static).

    Returns:
      kp3d:  (N, J, 3) world joint locations.
      skts:  (N, J, 4, 4) world-to-local transforms.
      l2ws:  (N, J, 4, 4) local-to-world transforms.
      rots:  (N, J, 3, 3) per-joint local rotation matrices.
    """
    N, J = bones.shape[:2]
    if rest_pose.ndim == 2:
        rest_pose = rest_pose[None]
    rest_pose = jnp.broadcast_to(rest_pose, (N, J, 3))

    rots = bones_to_rot(bones)  # (N, J, 3, 3)

    root = skel.root_id
    parents = np.asarray(skel.joint_trees)

    # Per-joint relative transforms: root uses its rest location; children use
    # offset from parent rest location (reference pose_opt.py:399-410).
    parent_rest = rest_pose[:, parents]  # (N, J, 3); root's parent is itself
    offsets = rest_pose - parent_rest
    offsets = offsets.at[:, root].set(rest_pose[:, root])
    rel = _to_homo(rots, offsets)  # (N, J, 4, 4)

    # Level-parallel accumulation. l2w[j] = l2w[parent(j)] @ rel[j].
    l2w = jnp.zeros((N, J, 4, 4), dtype=bones.dtype)
    l2w = l2w.at[:, root].set(rel[:, root])
    for level in skel.levels[1:]:
        idx = np.asarray(level)
        pidx = parents[idx]
        l2w = l2w.at[:, idx].set(
            jnp.matmul(l2w[:, pidx], rel[:, idx], precision='highest'))

    if pelvis is not None:
        l2w = l2w.at[..., :3, 3].add(pelvis[:, None, :])

    skts = rigid_inverse(l2w)
    kp3d = l2w[..., :3, 3]
    return kp3d, skts, l2w, rots


def get_smpl_l2ws_np(pose: np.ndarray, rest_pose: np.ndarray | None = None,
                     scale: float = 1.0,
                     skel: Skeleton = SMPLSkeleton,
                     use_rot_mats: bool = False) -> np.ndarray:
    """Host-side numpy FK for data preprocessing.

    Matches the reference `get_smpl_l2ws` (skeleton_utils.py:334-376): takes
    one (J, 3) axis-angle pose — or (J, 3, 3) rotation matrices when
    use_rot_mats — returns (J, 4, 4) local-to-world matrices. The chaining
    is identical to smplx's lbs() rigid transforms (root translation at
    rest_pose[root], children chained through rest offsets).
    """
    from scipy.spatial.transform import Rotation  # host-only dependency

    from ..skeleton import smpl_rest_pose
    if rest_pose is None:
        rest_pose = smpl_rest_pose
    rest_kp = rest_pose * scale
    if use_rot_mats:
        mrots = np.asarray(pose, np.float32)
    else:
        mrots = np.stack([Rotation.from_rotvec(p).as_matrix()
                          for p in pose]).astype(np.float32)

    def mat_to_homo(mat):
        return np.concatenate(
            [mat, np.array([[0, 0, 0, 1]], dtype=np.float32)], axis=0)

    joint_trees = skel.joint_trees
    root = skel.root_id
    l2ws = [None] * len(rest_kp)
    l2ws[root] = mat_to_homo(
        np.concatenate([mrots[root], rest_kp[root][:, None]], axis=-1))
    for level in skel.levels[1:]:
        for j in level:
            parent = joint_trees[j]
            rel = mat_to_homo(np.concatenate(
                [mrots[j], (rest_kp[j] - rest_kp[parent])[:, None]], axis=-1))
            l2ws[j] = l2ws[parent] @ rel
    return np.stack(l2ws).astype(np.float32)
