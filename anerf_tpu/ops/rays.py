"""Camera ray generation and coordinate-convention helpers.

Mirrors reference core/utils/ray_utils.py:6-152 and the NeRF<->CV convention
swaps in core/utils/skeleton_utils.py:442-444, 1308-1331. Ray generation is
provided both as host numpy (data layer, per sampled pixel) and as jnp (full
image rendering on device).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _focal_xy(focal) -> Tuple[float, float]:
    arr = np.asarray(focal, dtype=np.float32).reshape(-1)
    if arr.size < 2:
        return float(arr[0]), float(arr[0])
    return float(arr[0]), float(arr[1])


def get_rays_np(H: int, W: int, focal, c2w: np.ndarray,
                mesh=None, center=None) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel rays in world space (NeRF camera convention: -z forward,
    y up in camera frame; ray_utils.py:31-61)."""
    if mesh is None:
        i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32), indexing='xy')
    else:
        i, j = mesh
    focal_x, focal_y = _focal_xy(focal)
    if center is None:
        offset_x, offset_y = W * 0.5, H * 0.5
    else:
        offset_x, offset_y = center
    dirs = np.stack([(i - offset_x) / focal_x,
                     -(j - offset_y) / focal_y,
                     -np.ones_like(i)], -1)
    eye = np.eye(3)
    rot = c2w[:3, :3]
    if np.isclose(eye, rot).all():
        rays_d = dirs
    elif np.isclose(eye, np.abs(rot)).all():
        rays_d = dirs * rot.sum(-1)
    else:
        rays_d = np.sum(dirs[..., np.newaxis, :] * rot, -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays(H: int, W: int, focal, c2w: jnp.ndarray,
             center=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device twin of get_rays_np (jnp, static H/W)."""
    focal_x, focal_y = _focal_xy(focal)
    if center is None:
        offset_x, offset_y = W * 0.5, H * 0.5
    else:
        offset_x, offset_y = center
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing='xy')
    dirs = jnp.stack([(i - offset_x) / focal_x,
                      -(j - offset_y) / focal_y,
                      -jnp.ones_like(i)], -1)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def swap_mat(mat: np.ndarray) -> np.ndarray:
    """NeRF <-> CV camera matrix axis swap: [right, up, -forward, t] ->
    [right, -up, forward, t] (reference skeleton_utils.py:1308-1317)."""
    return np.concatenate([mat[..., 0:1], -mat[..., 1:2], -mat[..., 2:3],
                           mat[..., 3:]], axis=-1)


def nerf_c2w_to_extrinsic(c2w: np.ndarray) -> np.ndarray:
    """NeRF-convention camera-to-world -> CV extrinsic (world-to-camera)."""
    return np.linalg.inv(swap_mat(c2w))


def world_to_cam_np(pts: np.ndarray, extrinsic: np.ndarray, H: int, W: int,
                    focal, center=None) -> np.ndarray:
    """Project world points to pixel coordinates with a CV extrinsic."""
    if center is None:
        offset_x, offset_y = W * 0.5, H * 0.5
    else:
        offset_x, offset_y = center
    focal_x, focal_y = _focal_xy(focal)
    pts_h = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
    cam = pts_h @ extrinsic.T
    xy = cam[..., :2] / np.maximum(cam[..., 2:3], 1e-12)
    x = xy[..., 0] * focal_x + offset_x
    y = xy[..., 1] * focal_y + offset_y
    return np.stack([x, y], axis=-1)


def pack_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
              near, far, use_viewdirs: bool = True) -> jnp.ndarray:
    """Pack rays into the (R, 8|11) layout used across the framework:
    [o(3), d(3), near, far, viewdir(3)] (reference core/trainer.py:126-135).
    Viewdirs are the normalized directions."""
    R = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, rays_o.dtype).reshape(-1, 1)
                            if jnp.ndim(near) else jnp.full((1, 1), near,
                                                            rays_o.dtype),
                            (R, 1))
    far = jnp.broadcast_to(jnp.asarray(far, rays_o.dtype).reshape(-1, 1)
                           if jnp.ndim(far) else jnp.full((1, 1), far,
                                                          rays_o.dtype),
                           (R, 1))
    parts = [rays_o, rays_d, near, far]
    if use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        parts.append(viewdirs)
    return jnp.concatenate(parts, axis=-1)


def kp_to_valid_rays_np(poses: np.ndarray, H, W, focal,
                        kps: Optional[np.ndarray] = None,
                        cylinder_params: Optional[np.ndarray] = None,
                        centers=None, ext_scale: float = 0.00035):
    """Render-time ray culling: for each pose, the 2D box of the projected
    bounding cylinder selects the valid pixels (reference ray_utils.py:83-136).
    Host-side numpy; per-pose ray counts vary, the renderer pads to buckets.

    Returns (rays, valid_idxs, cylinder_params, bboxes).
    """
    from .cylinder import cylinder_to_box_2d, get_kp_bounding_cylinder

    if cylinder_params is None:
        assert kps is not None
        cylinder_params = get_kp_bounding_cylinder(
            np.asarray(kps), ext_scale=ext_scale, extend_mm=250,
            top_expand_ratio=1.60, bot_expand_ratio=1.10, head='-y')

    rays, valid_idxs, bboxes = [], [], []
    for i, c2w in enumerate(poses):
        cyl_param = cylinder_params[i % len(cylinder_params)]
        f = focal if isinstance(focal, float) else focal[i]
        center = None if centers is None else centers[i]
        h = H if isinstance(H, int) else H[i]
        w = W if isinstance(W, int) else W[i]

        ray_o, ray_d = get_rays_np(h, w, f, np.asarray(c2w), center=center)
        w2c = nerf_c2w_to_extrinsic(np.asarray(c2w))
        tl, br, _ = cylinder_to_box_2d(cyl_param, [h, w, f], w2c, center=center)

        hh, ww = np.meshgrid(np.arange(tl[1], br[1]), np.arange(tl[0], br[0]),
                             indexing='ij')
        valid_idx = (hh * w + ww).reshape(-1)
        rays.append((ray_o.reshape(-1, 3)[valid_idx],
                     ray_d.reshape(-1, 3)[valid_idx]))
        valid_idxs.append(valid_idx)
        bboxes.append((tl, br))
    return rays, valid_idxs, cylinder_params, bboxes
