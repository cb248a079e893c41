"""Volume compositing (raw network outputs -> pixel values), pure jnp.

Mirrors reference NeRF.raw2outputs (core/networks/nerf.py:150-205) including
the rgb epsilon stretch, noise-regularized density, the exclusive cumprod
transmittance, and the invalid-disparity masking.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def softplus_shifted(shift: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return lambda x: jax.nn.softplus(x - shift)


def get_density_fn(density_type: str, softplus_shift: float = 1.0
                   ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Density activation selection (reference raycasters.py:230-238)."""
    if density_type == 'relu':
        return jax.nn.relu
    if density_type == 'softplus':
        return softplus_shifted(softplus_shift)
    raise NotImplementedError(f'density activation {density_type} undefined')


def raw2outputs(raw: jnp.ndarray,
                z_vals: jnp.ndarray,
                rays_d: jnp.ndarray,
                raw_noise_std: float = 0.0,
                noise_key: Optional[jax.Array] = None,
                density_scale: float = 1.0,
                act_fn: Callable = jax.nn.relu,
                rgb_eps: float = 0.001) -> Dict[str, jnp.ndarray]:
    """Alpha-composite raw (R, S, 4) predictions along each ray.

    Returns rgb_map (R, 3), disp_map (R,), acc_map (R,), weights (R, S),
    alpha (R, S), depth_map (R,).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)  # (R, S)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3]) * (1 + 2 * rgb_eps) - rgb_eps

    sigma = raw[..., 3] / density_scale
    if raw_noise_std > 0.0 and noise_key is not None:
        sigma = sigma + jax.random.normal(
            noise_key, sigma.shape, sigma.dtype) * raw_noise_std * density_scale
    alpha = 1.0 - jnp.exp(-act_fn(sigma) * dists)

    # T_i = prod_{j<i} (1 - alpha_j + 1e-10): exclusive cumulative product.
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    depth_map = jnp.sum(weights * z_vals, -1)
    wsum = jnp.sum(weights, -1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / (wsum + 1e-10))
    disp_map = jnp.where(jnp.isclose(wsum, 0.0), 0.0, disp_map)
    acc_map = jnp.minimum(wsum, 1.0)

    return {'rgb_map': rgb_map, 'disp_map': disp_map, 'acc_map': acc_map,
            'weights': weights, 'alpha': alpha, 'depth_map': depth_map}
