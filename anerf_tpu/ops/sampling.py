"""Ray sampling: stratified, inverse-CDF importance, coarse/fine merge.

Mirrors reference core/utils/ray_utils.py:157-289 with device RNG (threefry
keys) instead of global torch RNG; all shapes static for jit. The coarse/fine
merge is a single `jnp.sort` + `take_along_axis` (SURVEY §7 "hard parts"),
replacing the reference's gather-based merge (core/raycasters.py:679-812).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample_from_lineseg(key: Optional[jax.Array],
                        near: jnp.ndarray, far: jnp.ndarray,
                        n_samples: int,
                        perturb: float = 0.0,
                        lindisp: bool = False) -> jnp.ndarray:
    """Stratified samples along [near, far] per ray.

    near/far: (R, 1). Returns z_vals (R, n_samples).
    perturb > 0 jitters each sample uniformly within its stratum
    (ray_utils.py:204-251).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)

    if perturb > 0.0:
        assert key is not None
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(key: Optional[jax.Array], bins: jnp.ndarray,
               weights: jnp.ndarray, n_samples: int,
               det: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling over histogram bins (ray_utils.py:157-201).

    bins: (R, B), weights: (R, B-1)... here matching the reference call
    convention: bins are the midpoints (R, M), weights (R, M).
    Returns samples (R, n_samples), detached from the weight gradient.
    """
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (R, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        assert key is not None
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,),
                               dtype=cdf.dtype)

    # Inverted CDF lookup as a dense compare-and-count: with ~80 bins a
    # (R, n_samples, n_bins) comparison is a few M lane-parallel ops,
    # far cheaper on TPU than the sequential binary search a vmapped
    # searchsorted lowers to.
    inds = jnp.sum(cdf[:, None, :] <= u[..., None], axis=-1).astype(jnp.int32)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    from .gather import take_rows
    # ONE one-hot gather for all four lookups: bins padded with their
    # last column up to cdf's width (so clamped indices read the same
    # value as the explicit min() did), cdf and padded bins stacked on a
    # feature axis, below/above indices concatenated on the row axis.
    # Exact (each output is one product).
    pad = cdf.shape[-1] - bins.shape[-1]
    binsp = bins if pad == 0 else jnp.concatenate(
        [bins] + [bins[..., -1:]] * pad, -1)
    data = jnp.stack([cdf, binsp], -1)
    got = take_rows(data, jnp.concatenate([below, above], -1))
    (cdf_below, bins_below), (cdf_above, bins_above) = (
        (got[:, :n_samples, 0], got[:, :n_samples, 1]),
        (got[:, n_samples:, 0], got[:, n_samples:, 1]))

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def stable_ranks(z: jnp.ndarray) -> jnp.ndarray:
    """Per-row stable sort ranks without a sort: rank[r, k] = position of
    z[r, k] in the stably-sorted row (ties broken by original index,
    matching jnp.argsort's stability).

    Computed as a dense pairwise compare-and-count — for the per-ray
    sample widths here (S+I <= ~150) that is a few M lane-parallel VPU
    ops, far cheaper than the bitonic sort network argsort lowers to on
    TPU, and (R, K) integer ranks feed the one-hot scatter_rows merge
    directly (no inverse-permutation gather needed).
    """
    lt = z[..., :, None] > z[..., None, :]              # z[k'] < z[k]
    K = z.shape[-1]
    idx = jnp.arange(K)
    tie_before = ((z[..., :, None] == z[..., None, :])
                  & (idx[None, :] < idx[:, None]))      # z equal, k' < k
    return jnp.sum(lt | tie_before, axis=-1).astype(jnp.int32)


def isample_from_lineseg(key: Optional[jax.Array],
                         z_vals: jnp.ndarray, weights: jnp.ndarray,
                         n_importance: int, det: bool = False,
                         is_only: bool = False, alpha_base: float = 0.01,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Importance sampling around existing z_vals (ray_utils.py:255-289).

    is_only applies the max-filter weight smoothing used by single_net mode:
    w' = 0.5*(max(w_l, w_k) + max(w_k, w_u)) + alpha_base.

    Returns (z_all_sorted, z_samples, merge_ranks) where z_all_sorted is
    the sorted union of old and new samples and merge_ranks the stable
    sort RANKS of the concatenated [z_vals, z_samples] (the inverse of
    the argsort permutation): feed per-sample tensors in concat order to
    `gather.scatter_rows(x, merge_ranks)` to reorder them into sorted-z
    order. Ranks come from a dense compare (stable_ranks), not a sort —
    TPU argsort lowers to a bitonic network that costs more than the
    whole compare at these widths (PERF.md round 5).
    """
    z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    if is_only:
        w_l = weights[..., 0:-2]
        w_k = weights[..., 1:-1]
        w_u = weights[..., 2:]
        dist_weights = 0.5 * (jnp.maximum(w_l, w_k)
                              + jnp.maximum(w_k, w_u)) + alpha_base
    else:
        dist_weights = weights[..., 1:-1]

    z_samples = sample_pdf(key, z_vals_mid, dist_weights, n_importance, det=det)
    z_samples = jax.lax.stop_gradient(z_samples)

    z_cat = jnp.concatenate([z_vals, z_samples], -1)
    merge_ranks = stable_ranks(z_cat)
    from .gather import scatter_rows
    z_all = scatter_rows(z_cat, merge_ranks)
    return z_all, z_samples, merge_ranks


def merge_sorted(coarse: jnp.ndarray, fine: jnp.ndarray,
                 merge_ranks: jnp.ndarray) -> jnp.ndarray:
    """Reorder concatenated per-sample tensors into sorted-z order.

    coarse: (R, S, ...), fine: (R, I, ...), merge_ranks: (R, S+I) stable
    ranks from isample_from_lineseg. Gradient-preserving one-hot scatter,
    the jnp equivalent of the reference merge (raycasters.py:796-812).
    """
    from .gather import scatter_rows
    cat = jnp.concatenate([coarse, fine], axis=1)
    flat = cat.reshape(cat.shape[:2] + (-1,))
    return scatter_rows(flat, merge_ranks).reshape(
        merge_ranks.shape + cat.shape[2:])
