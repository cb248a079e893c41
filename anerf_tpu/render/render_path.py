"""Full-image rendering: cylinder-culled rays, fixed-size buckets, canvas
compositing.

TPU re-design of reference render_path (run_nerf.py:27-145) +
kp_to_valid_rays culling (ray_utils.py:83-136). Per-frame valid-ray counts
vary, so rays are padded to a fixed bucket size and rendered by one jitted
function — no shape-dependent recompiles beyond the first.
"""
from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cylinder import cylinder_to_box_2d, get_kp_bounding_cylinder
from ..ops.rays import get_rays_np, nerf_c2w_to_extrinsic
from .raycaster import RenderConfig, render_rays


def make_render_fn(cfg: RenderConfig, use_framecode_idx: bool):
    """Jitted renderer: scans all ray buckets of one pose in ONE dispatch
    (per-dispatch latency dominates on remote-attached chips; the reference
    instead loops `chunk`-sized forwards host-side, trainer.py:64-79).

    The bucket count is part of the trace; pose ray counts are padded to
    power-of-two bucket counts by the caller to bound recompiles.
    """
    test_cfg = cfg.test_mode()

    @functools.partial(jax.jit, static_argnames=('n_buckets',))
    def fn(params, rays, kp3d, skts, bones, cyls, cam_idxs, tau,
           n_buckets: int = 1):
        R = rays.shape[0]
        chunk = R // n_buckets

        def one(rb):
            ret = render_rays(
                params, test_cfg, rb, kp3d, skts, bones, cyls,
                cam_idxs=cam_idxs if use_framecode_idx else None,
                rng=None, tau=tau,
                eval_framecode_mean=not use_framecode_idx)
            # only the consumed fields: per-sample alpha/weight maps would
            # otherwise be materialized bucket-by-bucket into HBM
            return {k: ret[k] for k in ('rgb_map', 'disp_map', 'acc_map')}

        rays_b = rays.reshape(n_buckets, chunk, rays.shape[-1])
        out = jax.lax.map(one, rays_b)
        return {k: v.reshape((R,) + v.shape[2:]) for k, v in out.items()}
    return fn


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def render_one_pose(render_fn, params, rays_o, rays_d, kp, skt, bone, cyl,
                    cam_idx: Optional[int], tau: float,
                    chunk: int = 4096) -> Dict[str, np.ndarray]:
    """Render a (possibly irregular) set of rays: pad to a power-of-two
    bucket count, one device dispatch."""
    n = rays_o.shape[0]
    n_buckets = _next_pow2(max(1, -(-n // chunk)))
    n_pad = n_buckets * chunk
    pad = n_pad - n

    rays_o = np.concatenate([rays_o, np.repeat(rays_o[-1:], pad, 0)])
    rays_d = np.concatenate([rays_d, np.repeat(rays_d[-1:], pad, 0)])
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = np.zeros((n_pad, 1), np.float32)
    far = np.ones((n_pad, 1), np.float32)
    rays = jnp.asarray(np.concatenate([rays_o, rays_d, near, far, viewdirs],
                                      -1).astype(np.float32))

    # per-ray pose rows within one bucket (replicated across buckets by the
    # closure): broadcast to chunk rows once
    kp_b = jnp.broadcast_to(jnp.asarray(kp), (chunk,) + kp.shape[-2:])
    skt_b = jnp.broadcast_to(jnp.asarray(skt), (chunk,) + skt.shape[-3:])
    bone_b = (jnp.broadcast_to(jnp.asarray(bone), (chunk,) + bone.shape[-2:])
              if bone is not None else None)
    cyl_b = jnp.broadcast_to(jnp.asarray(cyl), (chunk, cyl.shape[-1]))
    cam_b = (jnp.full((chunk,), cam_idx, jnp.int32)
             if cam_idx is not None else None)

    ret = render_fn(params, rays, kp_b, skt_b, bone_b, cyl_b, cam_b,
                    jnp.float32(tau), n_buckets=n_buckets)
    return {k: np.asarray(ret[k])[:n]
            for k in ('rgb_map', 'disp_map', 'acc_map')}


def render_path(params, cfg: RenderConfig,
                c2ws: np.ndarray, hwf, kps: np.ndarray, skts: np.ndarray,
                bones: Optional[np.ndarray],
                cam_idxs: Optional[np.ndarray] = None,
                centers: Optional[np.ndarray] = None,
                cyls: Optional[np.ndarray] = None,
                bgs: Optional[np.ndarray] = None,
                bg_idxs: Optional[np.ndarray] = None,
                tau: float = 2000.0,
                chunk: int = 4096,
                render_factor: int = 0,
                ext_scale: float = 0.001,
                white_bkgd: bool = True,
                use_framecode_idx: bool = False,
                verbose: bool = False) -> Dict[str, np.ndarray]:
    """Render a sequence of poses/cameras into full images.

    hwf: (H, W, focals) with H/W scalars or per-frame arrays.
    Returns dict with 'rgbs', 'disps', 'accs', 'bboxes' stacked (N, H, W, .).
    """
    H_all, W_all, focals = hwf
    n_poses = len(c2ws)

    if cyls is None:
        cyls = get_kp_bounding_cylinder(
            kps, ext_scale=ext_scale, extend_mm=250,
            top_expand_ratio=1.60, bot_expand_ratio=1.10, head='-y')

    render_fn = make_render_fn(cfg, use_framecode_idx)
    rgbs, disps, accs, bboxes = [], [], [], []
    for i in range(n_poses):
        t0 = time.time()
        H = int(H_all if np.isscalar(H_all) else np.asarray(H_all).reshape(-1)[
            i % np.asarray(H_all).size])
        W = int(W_all if np.isscalar(W_all) else np.asarray(W_all).reshape(-1)[
            i % np.asarray(W_all).size])
        focal = (float(focals) if np.isscalar(focals)
                 else np.asarray(focals).reshape(-1)[i % np.asarray(
                     focals).size])
        if render_factor > 0:
            H, W, focal = H // render_factor, W // render_factor, \
                focal / render_factor

        pose_i = i % len(kps)
        c2w = np.asarray(c2ws[i], np.float32)
        center = None if centers is None else centers[i]

        ray_o, ray_d = get_rays_np(H, W, focal, c2w, center=center)
        w2c = nerf_c2w_to_extrinsic(c2w)
        tl, br, _ = cylinder_to_box_2d(cyls[pose_i], [H, W, focal], w2c,
                                       center=center)
        hh, ww = np.meshgrid(np.arange(tl[1], br[1]),
                             np.arange(tl[0], br[0]), indexing='ij')
        valid_idx = (hh * W + ww).reshape(-1)

        out = render_one_pose(
            render_fn, params,
            ray_o.reshape(-1, 3)[valid_idx].astype(np.float32),
            ray_d.reshape(-1, 3)[valid_idx].astype(np.float32),
            kps[pose_i], skts[pose_i],
            None if bones is None else bones[pose_i],
            cyls[pose_i],
            None if cam_idxs is None else int(cam_idxs[i % len(cam_idxs)]),
            tau, chunk)

        # composite onto background canvas (run_nerf.py:100-131)
        if bgs is not None and bg_idxs is not None:
            canvas = np.asarray(bgs[bg_idxs[i % len(bg_idxs)]],
                                np.float32).copy()
            if render_factor > 0:
                import cv2
                canvas = cv2.resize(canvas, (W, H))
        elif white_bkgd:
            canvas = np.ones((H, W, 3), np.float32)
        else:
            canvas = np.zeros((H, W, 3), np.float32)

        canvas = canvas.reshape(-1, 3)
        acc = out['acc_map'][..., None]
        canvas[valid_idx] = (out['rgb_map'] * acc
                             + canvas[valid_idx] * (1.0 - acc))
        rgbs.append(canvas.reshape(H, W, 3))

        disp = np.zeros((H * W,), np.float32)
        disp[valid_idx] = np.nan_to_num(out['disp_map'])
        disps.append(disp.reshape(H, W))

        acc_img = np.zeros((H * W,), np.float32)
        acc_img[valid_idx] = out['acc_map']
        accs.append(acc_img.reshape(H, W))
        bboxes.append(np.stack([tl, br]))
        if verbose:
            print(f'pose {i}: {time.time() - t0:.2f}s '
                  f'({len(valid_idx)} rays)')

    return {'rgbs': np.stack(rgbs), 'disps': np.stack(disps),
            'accs': np.stack(accs), 'bboxes': np.stack(bboxes)}
