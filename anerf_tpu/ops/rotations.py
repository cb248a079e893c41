"""Rotation representation conversions in pure jnp.

The reference delegates to pytorch3d (core/utils/skeleton_utils.py:397-436);
here the conversions are implemented directly so the compute path has no
external native dependency and everything is jit/vmap/grad-safe on TPU.

Conventions match the reference exactly:
  * axis-angle -> rotation matrix via Rodrigues (stable near 0 with Taylor).
  * 6D representation is the first two COLUMNS of the rotation matrix,
    flattened row-major from a (3, 2) block: rot[..., :3, :2].reshape(6)
    (reference: rot_to_rot6d, skeleton_utils.py:408-409).
  * rot6d -> rotmat via Gram-Schmidt (Zhou et al. CVPR'19), matching
    skeleton_utils.py:420-436.
"""
from __future__ import annotations

import jax.numpy as jnp


def axisang_to_rot(axisang: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Rodrigues' formula with a series expansion for small angles so gradients
    are finite at zero rotation (needed: pose-opt starts near the anchors).
    """
    theta2 = jnp.sum(axisang * axisang, axis=-1, keepdims=True)  # (..., 1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
    sin_over = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cos_term = jnp.where(small, 0.5 - theta2 / 24.0,
                         (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))

    x, y, z = axisang[..., 0], axisang[..., 1], axisang[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)  # (..., 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axisang.dtype), K.shape)
    KK = jnp.matmul(K, K, precision='highest')
    return eye + sin_over[..., None] * K + cos_term[..., None] * KK


def rot_to_axisang(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3).

    Quaternion route (matches pytorch3d matrix_to_axis_angle numerically).
    """
    quat = rot_to_quat(rot)
    return quat_to_axisang(quat)


def rot_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4) (w, x, y, z).

    Branch-free Shepperd's method: compute all four candidate constructions
    and select the numerically best by the largest diagonal combination.
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]

    # Four squared magnitudes (x4): [w, x, y, z]
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    # candidate quats, each unnormalized
    qw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    denom = 2.0 * safe_sqrt(jnp.take_along_axis(
        mags, best[..., None].astype(jnp.int32), axis=-1))
    q = q / denom
    # canonicalize sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def quat_to_axisang(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) (w, x, y, z) -> axis-angle (..., 3)."""
    w = jnp.clip(quat[..., 0], -1.0, 1.0)
    xyz = quat[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    half = jnp.arctan2(norm[..., 0], w)[..., None]
    # angle/sin(angle/2) with Taylor at 0
    small = norm < 1e-6
    scale = jnp.where(small, 2.0 + 2.0 * half * half / 6.0,
                      2.0 * half / jnp.maximum(norm, 1e-30))
    return xyz * scale


def axisang_to_quat(axisang: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> quaternion (..., 4) (w, x, y, z)."""
    theta = jnp.linalg.norm(axisang, axis=-1, keepdims=True)
    half = 0.5 * theta
    small = theta < 1e-6
    sin_half_over = jnp.where(small, 0.5 - theta * theta / 48.0,
                              jnp.sin(half) / jnp.maximum(theta, 1e-30))
    w = jnp.cos(half)
    return jnp.concatenate([w, axisang * sin_half_over], axis=-1)


def rot6d_to_rot(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation rep (..., 6) -> rotation matrices (..., 3, 3).

    Mirrors the reference Gram-Schmidt exactly (skeleton_utils.py:420-436):
    x reshaped to (3, 2) column pairs, b1 = norm(a1),
    b2 = norm(a2 - <b1,a2> b1), b3 = b1 x b2, stacked as columns.
    """
    shape = x.shape[:-1]
    x = x.reshape(*shape, 3, 2)
    a1, a2 = x[..., 0], x[..., 1]

    def normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rot_to_rot6d(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> 6D rep (..., 6): first two columns."""
    return rot[..., :3, :2].reshape(*rot.shape[:-2], 6)


def rot6d_to_axisang(x: jnp.ndarray) -> jnp.ndarray:
    return rot_to_axisang(rot6d_to_rot(x))


def bones_to_rot(bones: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on trailing dim: 3 = axis-angle, 6 = 6D (skeleton_utils.py:397)."""
    if bones.shape[-1] == 3:
        return axisang_to_rot(bones)
    if bones.shape[-1] == 6:
        return rot6d_to_rot(bones)
    raise NotImplementedError(f'bone dim {bones.shape[-1]} unsupported')
