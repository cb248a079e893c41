"""Loss functions (reference core/trainer.py:8-61, 147-170)."""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def mse2psnr(x: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(x) / jnp.log(jnp.asarray(10.0))


def rgb_to_yuv(rgb: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray([[0.299, 0.587, 0.114],
                     [-0.14713, -0.28886, 0.436],
                     [0.615, -0.51499, -0.10001]], dtype=rgb.dtype)
    return rgb @ m.T


def img2mse(x, y, reduction='mean'):
    d = (x - y) ** 2
    if reduction == 'mean':
        return jnp.mean(d)
    if reduction == 'sum':
        return jnp.sum(d)
    return d


def img2l1(x, y, reduction='mean'):
    d = jnp.abs(x - y)
    if reduction == 'mean':
        return jnp.mean(d)
    if reduction == 'sum':
        return jnp.sum(d)
    return d


def img2huber(x, y, reduction='mean', beta=0.1):
    d = jnp.abs(x - y)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


def img2psnr(img, target):
    return mse2psnr(img2mse(img, target))


def acc2bce(x, y, reduction='mean', eps=1e-8):
    """BCE between accumulated alpha and the fg mask; reduction 'off'
    averages only over non-foreground pixels (trainer.py:44-54)."""
    bce = -(y * jnp.log(x + eps) + (1.0 - y) * jnp.log(1.0 - x + eps))
    if reduction == 'mean':
        return jnp.mean(bce)
    if reduction == 'sum':
        return jnp.sum(bce)
    if reduction == 'off':
        mask = (y < 1.0).astype(bce.dtype)
        return jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return bce


def get_loss_fn(loss_name: str, beta: float = 0.1) -> Callable:
    if loss_name == 'MSE':
        return img2mse
    if loss_name == 'L1':
        return img2l1
    if loss_name == 'Huber':
        return lambda x, y, reduction='mean': img2huber(x, y, reduction, beta)
    raise NotImplementedError(loss_name)


def get_reg_fn(reg_name: Optional[str]) -> Optional[Callable]:
    if reg_name is None:
        return None
    if reg_name == 'L1':
        return img2l1
    if reg_name == 'MSE':
        return img2mse
    if reg_name == 'BCE':
        return acc2bce
    raise NotImplementedError(reg_name)
