"""Trainable per-frame pose refinement as pure pytrees + functions.

Re-design of reference core/pose_opt.py:240-521. The PoseOptLayer becomes a
parameter pytree {'pelvis': (N, 3), 'bones': (N, J, 3|6)} plus the pure
`fk_lookup` function: gather the batch's frame parameters, run level-parallel
FK (ops/fk.py), return (kps, bones, skts, l2ws, rots). Gradients flow from
the RGB loss through the skeleton-relative encodings into the pose params by
ordinary jax.grad — there is no module, cache, or flip-flop machinery; the
dual-optimizer stepping semantics live in train/trainer.py.

Multi-view keypoint sharing (kp_map/kp_uidxs, reference pose_opt.py:258-295)
keeps per-view root bones + pelvis and shares non-root bones across views.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.fk import fk
from ..ops.rotations import axisang_to_rot, rot_to_rot6d, rot6d_to_axisang
from ..skeleton import Skeleton, SMPLSkeleton


@dataclasses.dataclass(frozen=True)
class PoseOptConfig:
    """Static pose-opt configuration (subset of the reference flags)."""
    use_rot6d: bool = False
    skel: Skeleton = SMPLSkeleton
    multiview: bool = False


def init_pose_params(kp3d: np.ndarray, bones: np.ndarray,
                     cfg: PoseOptConfig,
                     kp_map: Optional[np.ndarray] = None,
                     kp_uidxs: Optional[np.ndarray] = None) -> Dict[str, Any]:
    """Build the trainable pose pytree from initial estimates.

    kp3d: (N, J, 3) initial keypoints (pelvis taken from root joint).
    bones: (N, J, 3) axis-angle initial rotations.
    kp_map/kp_uidxs: multi-view sharing tables (or None).
    """
    root = cfg.skel.root_id
    pelvis = np.asarray(kp3d[:, root], dtype=np.float32)
    b = np.asarray(bones, dtype=np.float32)
    if cfg.use_rot6d:
        b = np.asarray(rot_to_rot6d(axisang_to_rot(jnp.asarray(b))))

    params: Dict[str, Any] = {'pelvis': jnp.asarray(pelvis)}
    if kp_map is None:
        params['bones'] = jnp.asarray(b)
    else:
        # per-view root bone; shared non-root bones indexed via kp_map
        params['root_bones'] = jnp.asarray(b[:, root])
        params['bones'] = jnp.asarray(b[np.asarray(kp_uidxs), root + 1:])
    return params


def pose_params_to_bones(params: Dict[str, Any], idxs: jnp.ndarray,
                         cfg: PoseOptConfig,
                         kp_map: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather (pelvis, bones) for frame indices (reference idx_to_params,
    pose_opt.py:318-332)."""
    pelvis = params['pelvis'][idxs]
    if kp_map is None:
        return pelvis, params['bones'][idxs]
    map_idx = kp_map[idxs]
    root_bones = params['root_bones'][idxs][:, None]
    bones = params['bones'][map_idx]
    return pelvis, jnp.concatenate([root_bones, bones], axis=1)


def fk_lookup(params: Dict[str, Any], idxs: jnp.ndarray,
              rest_pose: jnp.ndarray, cfg: PoseOptConfig,
              kp_map: Optional[jnp.ndarray] = None,
              rest_pose_idxs: Optional[jnp.ndarray] = None,
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                         jnp.ndarray]:
    """FK for the given frame indices.

    Unlike the reference (which dedups indices host-side,
    pose_opt.py:380), callers pass already-unique per-batch image indices and
    gather per-ray afterwards — batches are built that way by the sampler.

    rest_pose: (1|S, J, 3). With multiple subjects, rest_pose_idxs
    (N_frames,) maps each frame to its subject's rest pose (reference
    get_rest_pose, pose_opt.py:364-369).

    Returns (kps, bones, skts, l2ws, rots).
    """
    pelvis, bones = pose_params_to_bones(params, idxs, cfg, kp_map)
    if rest_pose.ndim == 3 and rest_pose.shape[0] > 1:
        assert rest_pose_idxs is not None, \
            'multi-subject rest poses need rest_pose_idxs'
        rest = rest_pose[rest_pose_idxs[idxs]]
    else:
        rest = rest_pose.reshape(-1, rest_pose.shape[-2], rest_pose.shape[-1])
    kp3d, skts, l2ws, rots = fk(bones, rest, pelvis, cfg.skel)
    return kp3d, bones, skts, l2ws, rots


def get_bones_axisang(params: Dict[str, Any], cfg: PoseOptConfig
                      ) -> jnp.ndarray:
    """All bones as axis-angle (for export / pose_ckpt_to_pose_data parity)."""
    bones = params['bones']
    if cfg.use_rot6d:
        return rot6d_to_axisang(bones)
    return bones


def get_noisy_bones(bones: np.ndarray, noise_degree: float,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Add half-masked gaussian noise to axis-angle bones
    (reference skeleton_utils.py:289-295)."""
    rng = rng or np.random.default_rng()
    scale = np.pi / 180.0 * noise_degree
    mask = (rng.random(bones.shape) > 0.5).astype(np.float32)
    return bones + rng.normal(0, scale, bones.shape) * mask


def perturb_poses(bones: np.ndarray, kp3d: np.ndarray,
                  rest_pose: np.ndarray,
                  noise_degree: float = 0.1,
                  noise_pelvis_mm: Optional[float] = None,
                  ext_scale: float = 0.001,
                  rng: Optional[np.random.Generator] = None,
                  skel: Skeleton = SMPLSkeleton):
    """Simulate noisy pose estimates for pose-refinement experiments
    (reference perturb_poses, skeleton_utils.py:297-321).

    Returns (noisy_bones, noisy_skts, noisy_kp3d).
    """
    from ..ops.fk import get_smpl_l2ws_np
    rng = rng or np.random.default_rng()
    noisy_bones = (bones if noise_degree is None
                   else get_noisy_bones(bones, noise_degree, rng))
    pelvis = kp3d[:, skel.root_id].copy()
    if noise_pelvis_mm is not None:
        pelvis += rng.normal(scale=noise_pelvis_mm * ext_scale,
                             size=pelvis.shape)
    l2ws = np.stack([get_smpl_l2ws_np(b, rest_pose, skel=skel)
                     for b in noisy_bones])
    l2ws[:, :, :3, -1] += pelvis[:, None]
    noisy_skts = np.linalg.inv(l2ws).astype(np.float32)
    noisy_kp = l2ws[:, :, :3, -1].astype(np.float32)
    return noisy_bones.astype(np.float32), noisy_skts, noisy_kp


def pose_anchor_tree(kp3d: np.ndarray, bones: np.ndarray) -> Dict[str, Any]:
    """Regularization anchors (reference create_popt, pose_opt.py:49-72).

    Stored as non-trainable arrays; rots recomputed from bones so they are
    always consistent.
    """
    rots = axisang_to_rot(jnp.asarray(bones, dtype=jnp.float32))
    return {
        'kps': jnp.asarray(kp3d, dtype=jnp.float32),
        'bones': jnp.asarray(bones, dtype=jnp.float32),
        'rots': rots,
    }
