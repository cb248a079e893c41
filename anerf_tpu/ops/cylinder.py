"""Bounding-cylinder geometry: construction, ray intersection, 2D projection.

TPU re-design of reference core/utils/skeleton_utils.py:542-694 and
core/utils/ray_utils.py:292-379. The ray/cylinder intersection runs inside
jit on device with NaN handling done branch-free via masking (the reference
patches NaNs with a host-side nanmean, ray_utils.py:328-342 — here invalid
rays fall back to the mean of the valid ones computed on-device).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..skeleton import Skeleton, get_skeleton_type


def get_kp_bounding_cylinder(kp: np.ndarray,
                             skel: Skeleton | None = None,
                             ext_scale: float = 0.00035,
                             extend_mm: float = 250,
                             top_expand_ratio: float = 1.0,
                             bot_expand_ratio: float = 0.25,
                             head: str | None = None) -> np.ndarray:
    """Cylinder around keypoints: (..., 5) = (cx, cz, radius, top, bot).

    head: '-y' for SPIN-estimated data, 'z' for SURREAL
    (reference: skeleton_utils.py:542-592). Host-side numpy: this runs in the
    data layer, once per frame.
    """
    assert head is not None, 'specify head direction (e.g. "-y" or "z")'
    if head.endswith('z'):
        g_axes, h_axis = [0, 1], 2
    elif head.endswith('y'):
        g_axes, h_axis = [0, 2], 1
    else:
        raise NotImplementedError(f'head orientation {head} not implemented')
    flip = -1 if head.startswith('-') else 1

    if skel is None:
        skel = get_skeleton_type(kp)

    root_loc = kp[..., skel.root_id, :]
    if kp.ndim == 2:
        dist = np.linalg.norm(kp[:, g_axes] - root_loc[g_axes], axis=-1)
    else:
        dist = np.linalg.norm(kp[..., g_axes] - root_loc[..., None, g_axes],
                              axis=-1)
    max_dist = dist.max(-1)
    max_height = (flip * kp[..., h_axis]).max(-1)
    min_height = (flip * kp[..., h_axis]).min(-1)

    extension = extend_mm * ext_scale
    radius = max_dist + extension
    top = flip * (max_height + extension * top_expand_ratio)
    bot = flip * (min_height - extension * bot_expand_ratio)
    return np.stack([root_loc[..., g_axes[0]], root_loc[..., g_axes[1]],
                     radius, top, bot], axis=-1).astype(np.float32)


def get_near_far_in_cylinder(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                             cyl: jnp.ndarray,
                             near: jnp.ndarray | float = 0.35,
                             far: jnp.ndarray | float = 2.75,
                             g_axes: Tuple[int, int] = (0, 2),
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray near/far from 2D circle intersection on the ground plane.

    Mirrors reference ray_utils.py:292-344 in jnp with branch-free NaN
    backfill: rays that miss the circle get the mean valid near/far (or the
    input bounds when no ray hits at all).

    rays_o/rays_d: (R, 3). cyl: (R, 5). near/far: scalar or (R, 1).
    Returns (new_near, new_far), both (R, 1).
    """
    g = list(g_axes)
    near = jnp.asarray(near, dtype=rays_o.dtype)
    far = jnp.asarray(far, dtype=rays_o.dtype)
    near_b = jnp.broadcast_to(jnp.reshape(near, (-1, 1)) if near.ndim else near,
                              (rays_o.shape[0], 1))
    far_b = jnp.broadcast_to(jnp.reshape(far, (-1, 1)) if far.ndim else far,
                             (rays_o.shape[0], 1))

    r_near = (rays_o + rays_d * near_b)[..., g]
    r_far = (rays_o + rays_d * far_b)[..., g]

    radius = cyl[..., 2:3]
    center = cyl[..., :2]

    nc = center - r_near
    nf = r_far - r_near
    nf_norm = jnp.linalg.norm(nf, axis=-1)
    scale = jnp.linalg.norm(rays_d[..., g], axis=-1, keepdims=True)

    cross = nc[..., 0] * nf[..., 1] - nc[..., 1] * nf[..., 0]
    dist = (jnp.abs(cross) / jnp.maximum(nf_norm, 1e-12))[..., None]

    q2 = radius ** 2 - dist ** 2
    hits = q2 >= 0.0  # (R, 1): ray's 2D line intersects the circle
    Q = jnp.sqrt(jnp.maximum(q2, 0.0))
    K = (jnp.sum(nc * nf, axis=-1) / jnp.maximum(nf_norm, 1e-12))[..., None]
    inside = (Q >= K).astype(rays_o.dtype)  # near point inside circle

    new_near = near_b + (1.0 - inside) * (K - Q) / jnp.maximum(scale, 1e-12)
    new_far = near_b + (K + Q) / jnp.maximum(scale, 1e-12)

    # Branch-free backfill for rays missing the cylinder: use the mean of
    # valid rays; if none valid, keep the input bounds.
    n_valid = jnp.maximum(jnp.sum(hits), 1)
    mean_near = jnp.sum(jnp.where(hits, new_near, 0.0)) / n_valid
    mean_far = jnp.sum(jnp.where(hits, new_far, 0.0)) / n_valid
    any_valid = jnp.any(hits)
    fill_near = jnp.where(any_valid, mean_near, 0.0)
    fill_far = jnp.where(any_valid, mean_far, 0.0)
    new_near = jnp.where(hits, new_near,
                         jnp.where(any_valid, fill_near, near_b))
    new_far = jnp.where(hits, new_far,
                        jnp.where(any_valid, fill_far, far_b))
    return new_near, new_far


def get_near_far_in_cylinder_np(rays_o, rays_d, cyl, near=0.35, far=2.75):
    """Host numpy twin (used by the data layer; ray_utils.py:346-379)."""
    g = [0, -1]
    r_near = (rays_o + rays_d * near)[..., g]
    r_far = (rays_o + rays_d * far)[..., g]
    radius = cyl[..., 2:3]
    center = cyl[..., :2]
    nc = center - r_near
    nf = r_far - r_near
    nf_norm = np.linalg.norm(nf, axis=-1)
    scale = np.linalg.norm(rays_d[..., g], axis=-1)[..., None]
    cross = nc[..., 0] * nf[..., 1] - nc[..., 1] * nf[..., 0]
    dist = (np.abs(cross) / nf_norm)[..., None]
    Q = (radius ** 2 - dist ** 2) ** 0.5
    K = ((nc * nf).sum(-1) / nf_norm)[..., None]
    mask = (Q < K).astype(np.float32)
    new_near = near + mask * (K - Q) / scale
    new_far = near + (K + Q) / scale
    return new_near, new_far


def focal_to_intrinsic_np(focal) -> np.ndarray:
    """(3, 4) projection matrix from focal length(s)."""
    if isinstance(focal, (int, float)) or np.asarray(focal).size < 2:
        focal_x = focal_y = float(np.asarray(focal).reshape(-1)[0])
    else:
        focal_x, focal_y = np.asarray(focal).reshape(-1)[:2]
    return np.array([[focal_x, 0, 0, 0],
                     [0, focal_y, 0, 0],
                     [0, 0, 1, 0]], dtype=np.float32)


def cylinder_to_box_2d(cylinder_params: np.ndarray, hwf, w2c=None,
                       scale: float = 1.0, center=None, make_int: bool = True):
    """Project a bounding cylinder to a 2D image-space box.

    Host-side numpy (render-time ray culling). Mirrors reference
    skeleton_utils.py:607-694: sample 50 angles on the top/bottom caps,
    project, take min/max. Returns (tl, br, pts_2d).
    """
    H, W, focal = hwf
    root_loc, radius = cylinder_params[..., :2], cylinder_params[..., 2:3]
    top, bot = cylinder_params[..., 3:4], cylinder_params[..., 4:5]

    rads = np.linspace(0.0, 2 * np.pi, 50)
    if root_loc.ndim == 1:
        root_loc, radius = root_loc[None], radius[None]
        top, bot = top[None], bot[None]
    N = root_loc.shape[0]

    x = root_loc[..., 0:1] + np.cos(rads)[None] * radius
    z = root_loc[..., 1:2] + np.sin(rads)[None] * radius
    y_top = top * np.ones_like(x)
    y_bot = bot * np.ones_like(x)
    w = np.ones_like(x)

    cap_pts = np.concatenate([
        np.stack([x, y_top, z, w], axis=-1),
        np.stack([x, y_bot, z, w], axis=-1)], axis=-2).reshape(-1, 4)

    intrinsic = focal_to_intrinsic_np(focal)
    if w2c is not None:
        cap_pts = cap_pts @ w2c.T
    cap_pts = (cap_pts @ intrinsic.T).reshape(N, -1, 3)
    pts_2d = cap_pts[..., :2] / cap_pts[..., 2:3]

    max_x = pts_2d[..., 0].max(-1)
    min_x = pts_2d[..., 0].min(-1)
    max_y = pts_2d[..., 1].max(-1)
    min_y = pts_2d[..., 1].min(-1)

    if make_int:
        max_x = np.ceil(max_x).astype(np.int32)
        min_x = np.floor(min_x).astype(np.int32)
        max_y = np.ceil(max_y).astype(np.int32)
        min_y = np.floor(min_y).astype(np.int32)

    tl = np.stack([min_x, min_y], axis=-1)
    br = np.stack([max_x, max_y], axis=-1)

    if center is None:
        offset_x, offset_y = int(W * 0.5), int(H * 0.5)
    else:
        offset_x, offset_y = int(center[0]), int(center[1])
    tl[:, 0] += offset_x
    tl[:, 1] += offset_y
    br[:, 0] += offset_x
    br[:, 1] += offset_y

    if scale != 1.0:
        box_w = (max_x - min_x) * 0.5 * scale
        box_h = (max_y - min_y) * 0.5 * scale
        cx = (br[:, 0] + tl[:, 0]).copy() * 0.5
        cy = (br[:, 1] + tl[:, 1]).copy() * 0.5
        tl[:, 0], br[:, 0] = cx - box_w, cx + box_w
        tl[:, 1], br[:, 1] = cy - box_h, cy + box_h

    tl[:, 0] = np.clip(tl[:, 0], 0, W - 1)
    br[:, 0] = np.clip(br[:, 0], 0, W - 1)
    tl[:, 1] = np.clip(tl[:, 1], 0, H - 1)
    br[:, 1] = np.clip(br[:, 1], 0, H - 1)

    if N == 1:
        tl, br, pts_2d = tl[0], br[0], pts_2d[0]
    return tl, br, pts_2d
