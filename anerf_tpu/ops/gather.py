"""Row gathers as one-hot MXU contractions.

TPU lowers `take_along_axis` to serial row loads ('custom fusion' ops
with zero FLOPs in the profile) and its VJP to scatters, which are worse.
For the small per-ray sample counts in this pipeline (S <= ~100), a
(R, K, S) one-hot contraction is a tiny matmul that runs on the MXU, and
its VJP is just the transposed matmul — no scatter anywhere. The
contraction runs at precision='highest': at TPU DEFAULT precision f32
matmul operands are truncated to a single bf16 pass, which would round
every gathered f32 value to 8 mantissa bits (z samples, CDF values) —
with 'highest' the result is f32-faithful (each output element is one
product 1.0 * x and a sum of zeros).

Measured on the culled flagship step (v5e-1): the gather/scatter family
cost ~6.5 ms/step before this change (see PERF.md round-2 trace).
"""
from __future__ import annotations

import jax.numpy as jnp


def take_rows(data: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(data, idx, axis=1) over rows, as a one-hot matmul.

    data: (R, S) or (R, S, C); idx: (R, K) integer. Returns (R, K) or
    (R, K, C) in data's dtype. Intended for small S (the one-hot is
    (R, K, S)).
    """
    S = data.shape[1]
    squeeze = data.ndim == 2
    d = data[..., None] if squeeze else data
    int_in = jnp.issubdtype(d.dtype, jnp.integer)
    if int_in:
        # integer gathers (e.g. index-permutation composition) ride the
        # same f32 one-hot matmul — exact for values < 2^24, which holds
        # for any per-ray sample index
        d = d.astype(jnp.float32)
    acc_dtype = d.dtype if d.dtype in (jnp.float32, jnp.bfloat16) \
        else jnp.float32
    oh = (idx[..., None] == jnp.arange(S, dtype=idx.dtype)).astype(acc_dtype)
    out = jnp.einsum('rks,rsc->rkc', oh, d.astype(acc_dtype),
                     preferred_element_type=acc_dtype,
                     precision='highest')
    out = out.astype(data.dtype) if data.dtype != out.dtype else out
    return out[..., 0] if squeeze else out


def scatter_rows(data: jnp.ndarray, ranks: jnp.ndarray) -> jnp.ndarray:
    """Permutation scatter over rows as a one-hot matmul:
    out[r, ranks[r, s], ...] = data[r, s, ...].

    The inverse of take_rows for a permutation (take_rows(x, sort_idxs)
    == scatter_rows(x, ranks) when ranks is the inverse permutation of
    sort_idxs). ranks must be a per-row permutation of arange(S) — e.g.
    from `sampling.stable_ranks`. Same MXU one-hot contraction and
    numerics as take_rows (precision='highest', transposed-matmul VJP,
    no scatter op anywhere).
    """
    S = data.shape[1]
    squeeze = data.ndim == 2
    d = data[..., None] if squeeze else data
    int_in = jnp.issubdtype(d.dtype, jnp.integer)
    if int_in:
        d = d.astype(jnp.float32)
    acc_dtype = d.dtype if d.dtype in (jnp.float32, jnp.bfloat16) \
        else jnp.float32
    oh = (ranks[..., None] == jnp.arange(S, dtype=ranks.dtype)
          ).astype(acc_dtype)
    out = jnp.einsum('rsp,rsc->rpc', oh, d.astype(acc_dtype),
                     preferred_element_type=acc_dtype,
                     precision='highest')
    out = out.astype(data.dtype) if data.dtype != out.dtype else out
    return out[..., 0] if squeeze else out
