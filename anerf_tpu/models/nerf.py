"""The A-NeRF MLP as an explicit param pytree with a functional apply.

Re-design of reference core/networks/nerf.py:12-148 and the Optcodes
per-frame latent codes (core/networks/embedding.py:4-44). Parameters are
plain nested dicts of jnp arrays (weights stored (in, out) so apply is
`x @ W + b`, the MXU-friendly layout); there is no module object, so the same
params flow through jit/grad/optax and shard trivially.

Parameter tree schema (documented for checkpoint import/export):
  {
    'pts_linears': [{'w': (in, W), 'b': (W,)} * D],
    'alpha_linear': {'w': (W, 1), 'b': (1,)},
    'feature_linear': {'w': (W, W), 'b': (W,)},
    'views_linears': [{'w': (vnet_in, W//2), 'b': (W//2,)}],
    'rgb_linear': {'w': (W//2, 3), 'b': (3,)},
    'framecodes': {'codes': (n_framecodes, framecode_ch)}   # optional
  }
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static MLP architecture config (reference NeRF.__init__ args)."""
    depth: int = 8                    # D
    width: int = 256                  # W
    input_ch: int = 360               # kp encoding width
    input_ch_bones: int = 72          # bone encoding width
    input_ch_views: int = 648         # view encoding width
    output_ch: int = 4                # when use_viewdirs=False
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    use_framecode: bool = False
    framecode_ch: int = 16
    n_framecodes: int = 0
    density_scale: float = 1.0

    @property
    def dnet_input(self) -> int:
        return self.input_ch + self.input_ch_bones

    @property
    def vnet_input(self) -> int:
        offset = self.framecode_ch if self.use_framecode else 0
        return self.input_ch_views + offset + self.width


def _linear_init(key: jax.Array, fan_in: int, fan_out: int
                 ) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight and bias (keeps init statistics identical to the
    reference so training curves are comparable)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        'w': jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                                -bound, bound),
        'b': jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def init_nerf_params(key: jax.Array, cfg: NeRFConfig) -> Dict[str, Any]:
    n_layers = cfg.depth
    keys = jax.random.split(key, n_layers + 5)

    pts_linears = []
    in_dim = cfg.dnet_input
    for i in range(n_layers):
        # layer i's input gets the skip concat if (i-1) in skips
        # (reference nerf.py:61-67: layer list is [Linear(in, W)] then
        # D-1 layers, layer i+1 takes W + dnet_input when i in skips)
        pts_linears.append(_linear_init(keys[i], in_dim, cfg.width))
        in_dim = cfg.width + cfg.dnet_input if i in cfg.skips else cfg.width

    params: Dict[str, Any] = {'pts_linears': pts_linears}
    if cfg.use_viewdirs:
        params['alpha_linear'] = _linear_init(keys[n_layers], cfg.width, 1)
        params['feature_linear'] = _linear_init(
            keys[n_layers + 1], cfg.width, cfg.width)
        params['views_linears'] = [
            _linear_init(keys[n_layers + 2], cfg.vnet_input, cfg.width // 2)]
        params['rgb_linear'] = _linear_init(
            keys[n_layers + 3], cfg.width // 2, 3)
    else:
        params['output_linear'] = _linear_init(
            keys[n_layers], cfg.width, cfg.output_ch)

    if cfg.use_framecode:
        # xavier normal on the embedding (embedding.py:36-38)
        std = np.sqrt(2.0 / (cfg.n_framecodes + cfg.framecode_ch))
        params['framecodes'] = {
            'codes': jax.random.normal(
                keys[n_layers + 4],
                (cfg.n_framecodes, cfg.framecode_ch)) * std}
    return params


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dense_mixed(w, b, x, compute_dtype):
    y = x.astype(compute_dtype) @ w.astype(compute_dtype)
    return y.astype(jnp.float32) + b


def _dense_mixed_fwd(w, b, x, compute_dtype):
    return _dense_mixed(w, b, x, compute_dtype), (w, x)


def _dense_mixed_bwd(compute_dtype, res, g):
    # Activation cotangents stay in compute_dtype: the incoming g is f32
    # (the f32 bias-add makes the primal output f32), and letting it flow
    # into the dots at f32 makes EVERY layer's input-grad matmul write an
    # f32 activation-sized tensor (~0.6 GB/step measured). Weight/bias
    # grads still accumulate in f32 (small outputs).
    w, x = res
    g_lo = g.astype(compute_dtype)
    gx = g_lo @ w.astype(compute_dtype).T
    gw = jnp.einsum('...i,...o->io', x.astype(compute_dtype), g_lo,
                    preferred_element_type=jnp.float32)
    gb = g.sum(tuple(range(g.ndim - 1)))
    return gw.astype(w.dtype), gb, gx.astype(x.dtype)


_dense_mixed.defvjp(_dense_mixed_fwd, _dense_mixed_bwd)


def _sr_noise_bits(key: jnp.ndarray, shape) -> jnp.ndarray:
    """16 uniform noise bits per element from a CHEAP counter hash.

    threefry (`jax.random.bits`) costs ~40 integer rounds per element and
    measured a 2.3x SLOWDOWN of the whole train step when emitted at the
    two cotangent cast sites per dense layer (PERF.md round-3 addendum).
    Stochastic rounding only needs decorrelated-from-the-data uniform
    bits, not crypto-strength: a murmur3-style finalizer over
    (element index * odd constant + key-derived salt) is 6 VPU ops per
    element and passes the unbiasedness tests to the same tolerance.
    """
    n = 1
    for s in shape:
        n *= s
    kd = (key if key.dtype == jnp.uint32
          else jax.random.key_data(key)).astype(jnp.uint32).reshape(-1)

    def fmix(h):  # murmur3 finalizer: full 32-bit avalanche
        h ^= h >> 16
        h *= jnp.uint32(0x85EBCA6B)
        h ^= h >> 13
        h *= jnp.uint32(0xC2B2AE35)
        h ^= h >> 16
        return h

    # avalanche the salt FIRST (scalar, free): raw PRNGKey data can be
    # (0, seed) with sequential seeds, and a weakly-mixed salt leaves a
    # measurable bias in the per-element noise mean (caught by
    # test_sr_cast_unbiased_and_exact_on_representables)
    salt = fmix(kd[0] * jnp.uint32(0x9E3779B9) ^ kd[-1])
    h = (jax.lax.iota(jnp.uint32, n).reshape(shape)
         * jnp.uint32(2654435761) + salt)
    return fmix(h) & jnp.uint32(0xFFFF)


def _sr_cast(x: jnp.ndarray, key: jnp.ndarray,
             dtype=jnp.bfloat16) -> jnp.ndarray:
    """Stochastically-rounded f32 -> bf16 cast: E[sr_cast(x)] == x.

    bf16 shares f32's exponent/sign layout, so truncating the low 16
    mantissa bits IS the round-toward-zero bf16 value; adding uniform
    noise in those 16 bits before truncating rounds up with probability
    equal to the dropped fraction — the classic unbiased SR-by-truncation
    construction (pltpu.stochastic_round is the in-kernel analog; this is
    the XLA-graph version, fusable into the producing matmul's epilogue).
    Finite inputs assumed (gradient tensors here are NaN-backfilled
    upstream); an inf/nan input may perturb its payload bits.
    """
    if dtype != jnp.bfloat16:
        return x.astype(dtype)
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = _sr_noise_bits(key, x.shape)
    return jax.lax.bitcast_convert_type(
        (bits + noise) & jnp.uint32(0xFFFF0000),
        jnp.float32).astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _dense_mixed_sr(w, b, x, key, compute_dtype):
    """Forward-identical twin of _dense_mixed whose backward keeps
    activation cotangents in compute_dtype with STOCHASTIC rounding at
    both bf16-producing sites (the incoming-g cast and the input-grad
    matmul result). Kills the systematic round-to-nearest bias that makes
    plain --fast_grads lose ~2 dB of background PSNR (tiny
    density-suppressing gradients on empty-space samples all rounding the
    same way — PERF.md); unbiased rounding makes them survive in
    expectation. Weight/bias grads accumulate in f32 exactly as the
    deterministic paths do."""
    y = x.astype(compute_dtype) @ w.astype(compute_dtype)
    return y.astype(jnp.float32) + b


def _dense_mixed_sr_fwd(w, b, x, key, compute_dtype):
    return _dense_mixed_sr(w, b, x, key, compute_dtype), (w, x, key)


def _dense_mixed_sr_bwd(compute_dtype, res, g):
    import numpy as np
    w, x, key = res
    k1, k2 = jax.random.split(key)
    g_lo = _sr_cast(g, k1, compute_dtype)
    w_lo = w.astype(compute_dtype)
    gx_f32 = jnp.einsum('...o,io->...i', g_lo, w_lo,
                        preferred_element_type=jnp.float32)
    gx = (_sr_cast(gx_f32, k2, x.dtype) if x.dtype == jnp.bfloat16
          else gx_f32.astype(x.dtype))
    gw = jnp.einsum('...i,...o->io', x.astype(compute_dtype), g_lo,
                    preferred_element_type=jnp.float32)
    gb = g.sum(tuple(range(g.ndim - 1)))
    return (gw.astype(w.dtype), gb, gx,
            np.zeros(key.shape, jax.dtypes.float0))


_dense_mixed_sr.defvjp(_dense_mixed_sr_fwd, _dense_mixed_sr_bwd)


def _dense(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
           compute_dtype=None, fast_grads: bool = False,
           sr_key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense layer: bf16 MXU matmul with f32 bias-add accumulation.

    fast_grads=True routes through the custom VJP that keeps activation
    cotangents in compute_dtype (~18% faster full train step, measured
    ~2 dB background-PSNR cost on the synthetic recipe — see PERF.md);
    default is the standard f32-cotangent backward. sr_key (with
    fast_grads) selects the stochastically-rounded cotangent twin
    (--sr_grads): same low-precision speed, unbiased rounding.
    """
    w, b = p['w'], p['b']
    if compute_dtype is None:
        return x @ w + b
    if fast_grads:
        if sr_key is not None:
            return _dense_mixed_sr(w, b, x, sr_key, compute_dtype)
        return _dense_mixed(w, b, x, compute_dtype)
    y = x.astype(compute_dtype) @ w.astype(compute_dtype)
    return y.astype(jnp.float32) + b


def forward_density(params: Dict[str, Any], cfg: NeRFConfig,
                    input_pts: jnp.ndarray,
                    compute_dtype=jnp.bfloat16,
                    fast_grads: bool = False,
                    sr_key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Density trunk: 8 layers, ReLU, skip concat (nerf.py:94-102).

    input_pts: (..., dnet_input). Returns trunk features (..., W).
    Matmuls run in `compute_dtype` (bf16 on the MXU) with f32 accumulation
    via the f32 bias add; set compute_dtype=None for strict f32 parity tests.
    """
    h = input_pts
    for i, layer in enumerate(params['pts_linears']):
        k = None if sr_key is None else jax.random.fold_in(sr_key, i)
        h = _dense(layer, h, compute_dtype, fast_grads, sr_key=k)
        h = jax.nn.relu(h)
        if compute_dtype is not None:
            # store activations (and therefore their cotangents) in the
            # compute dtype; per-layer accumulation stays f32 in _dense
            h = h.astype(compute_dtype)
        if i in cfg.skips:
            h = jnp.concatenate([input_pts.astype(h.dtype), h], -1)
    return h


def lookup_framecodes(params: Dict[str, Any], idx: jnp.ndarray,
                      eval_mean: bool = False) -> jnp.ndarray:
    """Per-frame latent code lookup (embedding.py:17-33).

    idx: (R,) int frame indices, or (R, 3) [idx0, idx1, lerp_w] for two-code
    interpolation. eval_mean substitutes the mean code (render-time idx < 0).
    """
    codes = params['framecodes']['codes']
    if eval_mean:
        mean = jnp.mean(codes, axis=0, keepdims=True)
        n = idx.shape[0]
        return jnp.broadcast_to(mean, (n, codes.shape[-1]))
    if idx.ndim == 2 and idx.shape[-1] == 3:
        c0 = codes[idx[..., 0].astype(jnp.int32)]
        c1 = codes[idx[..., 1].astype(jnp.int32)]
        w = idx[..., 2:3]
        return c0 * (1.0 - w) + c1 * w
    return codes[idx.reshape(-1).astype(jnp.int32)]


def forward_view(params: Dict[str, Any], cfg: NeRFConfig,
                 input_views: jnp.ndarray, h: jnp.ndarray,
                 framecodes: Optional[jnp.ndarray] = None,
                 compute_dtype=jnp.bfloat16,
                 fast_grads: bool = False,
                 sr_key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Radiance head (nerf.py:114-131). framecodes: (..., framecode_ch)
    already gathered per-sample, or None."""
    def sk(i):
        return None if sr_key is None else jax.random.fold_in(sr_key, 100 + i)
    feature = _dense(params['feature_linear'], h, compute_dtype, fast_grads,
                     sr_key=sk(0))
    if cfg.use_framecode:
        assert framecodes is not None
        input_views = jnp.concatenate([input_views, framecodes], -1)
    if compute_dtype is not None:
        feature = feature.astype(compute_dtype)
        input_views = input_views.astype(compute_dtype)
    hv = jnp.concatenate([feature, input_views], -1)
    for i, layer in enumerate(params['views_linears']):
        hv = jax.nn.relu(_dense(layer, hv, compute_dtype, fast_grads,
                                sr_key=sk(1 + i)))
        if compute_dtype is not None:
            hv = hv.astype(compute_dtype)
    return _dense(params['rgb_linear'], hv, compute_dtype, fast_grads,
                  sr_key=sk(50))


def apply_nerf(params: Dict[str, Any], cfg: NeRFConfig,
               input_pts: jnp.ndarray, input_views: jnp.ndarray,
               framecodes: Optional[jnp.ndarray] = None,
               compute_dtype=jnp.bfloat16,
               fast_grads: bool = False,
               alpha_f32: bool = False,
               sr_key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full forward: (..., dnet_in), (..., views_in) -> raw (..., 4)
    = [rgb_logits(3), sigma(1)] (nerf.py:133-148).

    alpha_f32: keep the default f32-cotangent backward on the alpha
    (density) head even when fast_grads lowers the rest to bf16.
    sr_key (with fast_grads): stochastically-rounded bf16 cotangents
    (--sr_grads) — forward math identical to fast_grads."""
    def sk(i):
        return None if sr_key is None else jax.random.fold_in(sr_key, 200 + i)
    h = forward_density(params, cfg, input_pts, compute_dtype, fast_grads,
                        sr_key=sr_key)
    if cfg.use_viewdirs:
        alpha = _dense(params['alpha_linear'], h, compute_dtype,
                       fast_grads and not alpha_f32,
                       sr_key=None if alpha_f32 else sk(0))
        rgb = forward_view(params, cfg, input_views, h, framecodes,
                           compute_dtype, fast_grads, sr_key=sr_key)
        return jnp.concatenate([rgb, alpha], -1)
    return _dense(params['output_linear'], h, compute_dtype, fast_grads,
                  sr_key=sk(1))
