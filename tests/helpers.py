"""Shared test fixtures: tiny configs and synthetic batches."""
import numpy as np

import jax
import jax.numpy as jnp

from anerf_tpu.config import TrainConfig
from anerf_tpu.ops.fk import fk
from anerf_tpu.render.factory import build_render_config, init_render_params
from anerf_tpu.skeleton import SMPLSkeleton, smpl_rest_pose


def tiny_args(**overrides):
    defaults = dict(
        netdepth=4, netwidth=32, netwidth_fine=32,
        multires=3, multires_views=2, multires_bones=0,
        N_samples=8, N_importance=4, N_rand=64, N_sample_images=4,
        use_viewdirs=True, use_cutoff=True, cutoff_viewdir=True,
        cutoff_inputs=True, use_background=True,
        ext_scale=0.001, raw_noise_std=0.0, perturb=1.0,
        opt_framecode=True, compute_dtype='float32',
    )
    defaults.update(overrides)
    return TrainConfig(**defaults)


def synthetic_pose_data(rng, n_frames, scale=0.0025):
    rest = smpl_rest_pose * scale
    bones = (rng.normal(size=(n_frames, 24, 3)) * 0.2).astype(np.float32)
    pelvis = (rng.normal(size=(n_frames, 3)) * 0.1).astype(np.float32)
    kp3d, skts, l2ws, _ = fk(jnp.asarray(bones), jnp.asarray(rest),
                             jnp.asarray(pelvis))
    from anerf_tpu.ops.cylinder import get_kp_bounding_cylinder
    cyls = get_kp_bounding_cylinder(np.asarray(kp3d), ext_scale=0.001,
                                    head='-y')
    return {'rest_pose': rest.astype(np.float32),
            'bones': bones, 'pelvis': pelvis,
            'kp3d': np.asarray(kp3d), 'skts': np.asarray(skts),
            'cyls': cyls.astype(np.float32)}


def synthetic_batch(rng, pose, n_rays=64, n_images=4):
    """Build a device batch aimed at the synthetic skeleton."""
    n_frames = pose['kp3d'].shape[0]
    kp_idxs = rng.choice(n_frames, size=n_images, replace=False).astype(
        np.int32)
    pose_idx = np.repeat(np.arange(n_images, dtype=np.int32),
                         n_rays // n_images)

    # rays from a ring of cameras pointing at each frame's root
    roots = pose['kp3d'][kp_idxs][:, 0]
    cam_o = roots + np.array([0.0, 0.0, 3.0], np.float32)
    rays_o = cam_o[pose_idx]
    target_pts = (roots[pose_idx]
                  + rng.normal(size=(n_rays, 3)).astype(np.float32) * 0.3)
    rays_d = target_pts - rays_o
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = np.full((n_rays, 1), 0.35, np.float32)
    far = np.full((n_rays, 1), 6.0, np.float32)
    rays = np.concatenate([rays_o, rays_d, near, far, viewdirs], -1)

    return {
        'rays': jnp.asarray(rays),
        'target_s': jnp.asarray(
            rng.uniform(size=(n_rays, 3)).astype(np.float32)),
        'fgs': jnp.asarray(
            (rng.uniform(size=(n_rays, 1)) > 0.5).astype(np.float32)),
        'bgs': jnp.ones((n_rays, 3), jnp.float32),
        'cam_idxs': jnp.asarray(kp_idxs[pose_idx]),
        'pose_idx': jnp.asarray(pose_idx),
        'kp_idxs': jnp.asarray(kp_idxs),
        'kp3d': jnp.asarray(pose['kp3d'][kp_idxs]),
        'bones': jnp.asarray(pose['bones'][kp_idxs]),
        'skts': jnp.asarray(pose['skts'][kp_idxs]),
        'cyls': jnp.asarray(pose['cyls'][kp_idxs]),
        'temp_val': jnp.ones((n_images,), jnp.float32),
    }


def build_tiny(rng, n_frames=8, **overrides):
    args = tiny_args(**overrides)
    pose = synthetic_pose_data(rng, n_frames)
    data_attrs = {'skel_type': SMPLSkeleton, 'n_views': n_frames,
                  'rest_pose': pose['rest_pose']}
    cfg = build_render_config(args, data_attrs)
    params = init_render_params(jax.random.PRNGKey(0), args, cfg)
    return args, cfg, params, pose
