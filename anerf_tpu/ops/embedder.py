"""Positional encoding with distance-based cutoff windows, functional jnp.

Re-design of reference core/cutoff_embedder.py. The embedder is a frozen
config dataclass plus a pure `embed(cfg, x, dists, tau, alpha)` function:
no buffers, no stateful modules. The tau / frequency-schedule values are
derived from the global step by pure schedule functions and passed in, so
the whole thing traces cleanly inside the jitted train step.

Output layout matches the reference bit-for-bit (needed for checkpoint
parity): blocks of width D ordered [input, sin f0, cos f0, sin f1, cos f1,
...] along the last axis (CutoffEmbedder._embed, cutoff_embedder.py:111-174).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EmbedConfig:
    """Static embedder configuration.

    Mirrors get_embedder + CutoffEmbedder kwargs
    (cutoff_embedder.py:61-109, 199-224).
    """
    input_dims: int
    num_freqs: int                       # 'multires'
    include_input: bool = True
    log_sampling: bool = True
    # cutoff settings
    cutoff: bool = False
    cutoff_dim: int = 24                 # number of joints carrying dists
    cutoff_inputs: bool = False          # window the raw input block too
    dist_inputs: bool = False            # dists provided separately (expand)
    cut_to_cutoff: bool = False
    shift_inputs: bool = False
    normalize: bool = False
    freq_schedule: bool = False
    init_alpha: float = 0.0
    init_tau: float = 20.0

    @property
    def identity(self) -> bool:
        return False

    @property
    def max_freq_log2(self) -> float:
        return float(self.num_freqs - 1)

    @property
    def out_dim(self) -> int:
        d = self.input_dims
        out = d if self.include_input else 0
        return out + 2 * self.num_freqs * d

    @property
    def expand(self) -> int:
        """How many input channels share one joint distance."""
        if not self.dist_inputs:
            return 1
        assert self.input_dims % self.cutoff_dim == 0
        return self.input_dims // self.cutoff_dim

    def freq_bands(self) -> np.ndarray:
        if self.num_freqs == 0:
            return np.zeros((0,), dtype=np.float32)
        if self.log_sampling:
            return (2.0 ** np.linspace(0.0, self.max_freq_log2,
                                       self.num_freqs)).astype(np.float32)
        return np.linspace(2.0 ** 0.0, 2.0 ** self.max_freq_log2,
                           self.num_freqs).astype(np.float32)

    def freq_k(self) -> np.ndarray:
        """log2 of freq bands repeated for (sin, cos): shape (NF, 2)."""
        fb = self.freq_bands()
        return np.log2(np.maximum(fb, 1e-30))[:, None].repeat(2, 1).astype(
            np.float32)


def tau_schedule(cfg: EmbedConfig, global_step: jnp.ndarray,
                 cutoff_step: int, cutoff_rate: float) -> jnp.ndarray:
    """tau = init_tau * rate^(step / (cutoff_step*1000)), clamp 2000
    (cutoff_embedder.py:181-183)."""
    g = jnp.asarray(global_step, jnp.float32)
    return jnp.minimum(
        cfg.init_tau * cutoff_rate ** (g / float(cutoff_step * 1000)), 2000.0)


def alpha_schedule(cfg: EmbedConfig, global_step: jnp.ndarray,
                   alpha_step: int, target: Optional[float] = None
                   ) -> jnp.ndarray:
    """Linear BARF-style coarse-to-fine alpha (cutoff_embedder.py:185-190)."""
    if target is None:
        target = float(np.max(cfg.freq_k())) if cfg.num_freqs else 0.0
    g = jnp.asarray(global_step, jnp.float32)
    return cfg.init_alpha + (target - cfg.init_alpha) * g / float(
        alpha_step * 1000)


def _schedule_w(cfg: EmbedConfig, alpha: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-(freq, fn) window from the frequency schedule, (2*NF, 1)
    (cutoff_embedder.py:192-197)."""
    if not cfg.freq_schedule or alpha is None or cfg.num_freqs == 0:
        return jnp.ones((1, 1), dtype=jnp.float32)
    freq_k = jnp.asarray(cfg.freq_k())  # (NF, 2)
    diff = jnp.clip(alpha - freq_k, 0.0, 1.0)
    w = 0.5 * (1.0 - jnp.cos(np.pi * diff))
    return w.reshape(-1, 1)  # (2NF, 1), f-major (sin, cos) pairs


def _make_sincos_pe(fb: np.ndarray, out_dtype):
    """sin/cos PE block with a low-precision backward.

    Forward: args (x broadcast against the freq bands) stay f32 — the
    high-frequency phases need the mantissa — but sin/cos emit in
    out_dtype. Backward: the wide (..., NF, D) cotangent math runs entirely
    in out_dtype (sin/cos recomputed, never stored), and only the
    freq-reduced (..., D) input gradient is accumulated in f32. Without
    this, the VJP of the f32->bf16 convert upcasts the cotangents and the
    backward pass writes ~0.6 GB/step of f32 encoding gradients.
    """
    fb_f = jnp.asarray(fb, jnp.float32)

    @jax.custom_vjp
    def sincos_pe(x):
        arg = fb_f[:, None] * x[..., None, :]
        return jnp.sin(arg).astype(out_dtype), jnp.cos(arg).astype(out_dtype)

    def fwd(x):
        return sincos_pe(x), x

    def bwd(x, cots):
        cot_s, cot_c = cots
        arg = fb_f[:, None] * x[..., None, :]
        s = jnp.sin(arg).astype(out_dtype)
        c = jnp.cos(arg).astype(out_dtype)
        g_arg = cot_s * c - cot_c * s                      # (..., NF, D)
        gx = jnp.einsum('...fd,f->...d', g_arg, fb_f.astype(out_dtype),
                        preferred_element_type=jnp.float32)
        return (gx.astype(x.dtype),)

    sincos_pe.defvjp(fwd, bwd)
    return sincos_pe


def _make_window_pe(fb: np.ndarray, include_input: bool,
                    cutoff_inputs: bool, out_dtype, bwd_dtype):
    """Cutoff-windowed PE with f32 forward and a rematerialized backward.

    Forward: the EXACT default f32 chain (sin/cos, stack, concat of the
    raw-input block, window multiply) emitted in out_dtype — bit-identical
    to the default path followed by `.astype(out_dtype)`, because rounding
    happens exactly once, at emission. Backward: residuals are only the
    SMALL primal inputs (x_freq, x_raw, w); sin/cos are recomputed inside
    the backward fusion instead of being stored as wide (..., K, D) f32
    residuals. The wide cotangent math runs in `bwd_dtype`:

    - bwd_dtype == out_dtype (bf16): the `hifi_pe` knob — gradient noise is
      fast_grads-class, forward rendering is default-class.
    - bwd_dtype == float32: the `remat_pe` knob — the backward computes the
      same f32 VALUES as the plain-autodiff default (sin/cos of the same
      f32 args, f32 products, f32-accumulated reductions; only reduction
      order differs, ~1 ulp), so numerics are protocol-default-class while
      the forward residual traffic is eliminated.

    Only the freq-reduced input gradients and the channel-reduced window
    gradient accumulate in f32 in both modes. Covers the standard branch
    combo (freq_schedule off, no normalize); `embed` falls back to the
    plain paths otherwise.
    """
    fb_f = jnp.asarray(fb, jnp.float32)
    NF = len(fb)

    def _emb_bwd(x_freq):
        arg = fb_f[:, None] * x_freq[..., None, :]
        s = jnp.sin(arg).astype(bwd_dtype)
        c = jnp.cos(arg).astype(bwd_dtype)
        e = jnp.stack([s, c], axis=-2)
        return e.reshape(*e.shape[:-3], 2 * NF, e.shape[-1]), s, c

    def _bshape(x_freq, x_raw, w):
        return jnp.broadcast_shapes(x_freq[..., None, :].shape[:-2],
                                    x_raw[..., None, :].shape[:-2],
                                    w.shape[:-2])

    @jax.custom_vjp
    def hifi_pe(x_freq, x_raw, w):
        arg = fb_f[:, None] * x_freq[..., None, :]
        emb = jnp.stack([jnp.sin(arg), jnp.cos(arg)], axis=-2)
        emb = emb.reshape(*emb.shape[:-3], 2 * NF, emb.shape[-1])
        xb = x_raw[..., None, :]
        batch = _bshape(x_freq, x_raw, w)
        if include_input and cutoff_inputs:
            xb = jnp.broadcast_to(xb, batch + xb.shape[-2:])
            emb = jnp.broadcast_to(emb, batch + emb.shape[-2:])
            emb = jnp.concatenate([xb, emb], axis=-2)
            emb = emb * w
        elif include_input:
            emb = emb * w
            xb = jnp.broadcast_to(xb, batch + xb.shape[-2:])
            emb = jnp.broadcast_to(emb, batch + emb.shape[-2:])
            emb = jnp.concatenate([xb, emb], axis=-2)
        else:
            emb = emb * w
        return emb.astype(out_dtype)

    def fwd(x_freq, x_raw, w):
        return hifi_pe(x_freq, x_raw, w), (x_freq, x_raw, w)

    def _reduce_to(g, shape):
        """Sum g over broadcast axes so it matches `shape` (f32 accum)."""
        extra = g.ndim - len(shape)
        if extra > 0:
            g = g.sum(tuple(range(extra)))
        axes = tuple(i for i, (a, b) in enumerate(zip(g.shape, shape))
                     if a != b)
        if axes:
            g = g.sum(axes, keepdims=True)
        return g

    def bwd(res, g):
        x_freq, x_raw, w = res
        g = g.astype(bwd_dtype)
        w_b = w.astype(bwd_dtype)
        emb_b, s_b, c_b = _emb_bwd(x_freq)
        if include_input and cutoff_inputs:
            g_cat = g * w_b
            xb = x_raw[..., None, :].astype(bwd_dtype)
            # window grad: out = cat(xb, emb) * w — the raw-input row plus
            # the freq rows, both reduced over K in f32
            cat_x = jnp.broadcast_to(xb, g[..., :1, :].shape)
            gw = (g[..., :1, :] * cat_x).astype(jnp.float32).sum(
                -2, keepdims=True)
            gw = gw + jnp.einsum('...kd,...kd->...d', g[..., 1:, :], emb_b,
                                 preferred_element_type=jnp.float32
                                 )[..., None, :]
            g_raw = g_cat[..., 0, :]
            g_freq = g_cat[..., 1:, :]
        elif include_input:
            g_raw = g[..., 0, :]
            g_fw = g[..., 1:, :]
            gw = jnp.einsum('...kd,...kd->...d', g_fw, emb_b,
                            preferred_element_type=jnp.float32)[..., None, :]
            g_freq = g_fw * w_b
        else:
            gw = jnp.einsum('...kd,...kd->...d', g, emb_b,
                            preferred_element_type=jnp.float32)[..., None, :]
            g_freq = g * w_b
        gp = g_freq.reshape(*g_freq.shape[:-2], NF, 2, g_freq.shape[-1])
        g_arg = gp[..., 0, :] * c_b - gp[..., 1, :] * s_b
        gx_freq = jnp.einsum('...fd,f->...d', g_arg,
                             fb_f.astype(bwd_dtype),
                             preferred_element_type=jnp.float32)
        gx_freq = _reduce_to(gx_freq, x_freq.shape).astype(x_freq.dtype)
        g_raw_f = _reduce_to(g_raw.astype(jnp.float32), x_raw.shape
                             ).astype(x_raw.dtype)
        gw = _reduce_to(gw, w.shape).astype(w.dtype)
        return gx_freq, g_raw_f, gw

    hifi_pe.defvjp(fwd, bwd)
    return hifi_pe


def embed(cfg: EmbedConfig,
          inputs: jnp.ndarray,
          dists: Optional[jnp.ndarray] = None,
          cutoff_dist: Optional[jnp.ndarray] = None,
          tau: Optional[jnp.ndarray] = None,
          alpha: Optional[jnp.ndarray] = None,
          out_dtype=None,
          hifi_dtype=None,
          remat_dtype=None,
          ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Apply the (cutoff) positional encoding.

    out_dtype: if set (e.g. bfloat16), the sin/cos ARGUMENTS stay f32 (the
    high-frequency phases need the mantissa) but the results are emitted in
    out_dtype, so the wide stack/schedule/concat/window-multiply chain runs
    at half HBM bandwidth and the cast into the MLP compute dtype is free.

    inputs: (..., D). dists: (..., cutoff_dim) per-joint distances (only used
    when cfg.cutoff). cutoff_dist: (cutoff_dim,) per-joint cutoff radii.
    Returns (embedded (..., out_dim), cutoff weights or None).
    """
    if not cfg.cutoff:
        return _embed_plain(cfg, inputs), None

    assert dists is not None and cutoff_dist is not None and tau is not None
    NF = cfg.num_freqs
    fb = jnp.asarray(cfg.freq_bands())  # (NF,)

    if cfg.dist_inputs:
        e = cfg.expand
        # joint-major repeat: each joint's dist covers its `e` channels
        dists_e = jnp.repeat(dists, e, axis=-1)              # (..., D)
        cut_e = jnp.repeat(cutoff_dist, e, axis=-1)          # (D,)
        x = inputs                                           # raw include block
        x_freq = x                                           # feeds sin/cos
        v = tau * (dists_e - cut_e)
    else:
        # inputs are themselves the per-joint distances
        dists_e = inputs
        x = inputs
        if cfg.cut_to_cutoff:
            x = cutoff_dist - x
        # NOTE: shift applies only to the frequency inputs; the raw
        # include-input block stays unshifted (cutoff_embedder.py:129-136
        # never reassigns `inputs` in the shift branch).
        x_freq = x * (2.0 / cutoff_dist) - 1.0 if cfg.shift_inputs else x
        v = tau * (dists_e - cutoff_dist)

    w = 1.0 - jax.nn.sigmoid(v)[..., None, :]                # (..., 1, D)

    _vjp_emit = hifi_dtype if hifi_dtype is not None else remat_dtype
    if (_vjp_emit is not None and out_dtype is None
            and not cfg.freq_schedule and not cfg.normalize
            and cfg.num_freqs > 0):
        # custom-VJP windowed PE, forward bit-identical to the default
        # chain + final cast (single rounding at emission). hifi_dtype:
        # bf16 backward math (fast_grads-class grads). remat_dtype: f32
        # backward math — protocol-default gradient VALUES with the wide
        # f32 residuals rematerialized instead of stored.
        bwd_dtype = hifi_dtype if hifi_dtype is not None else jnp.float32
        pe_fn = _make_window_pe(cfg.freq_bands(), cfg.include_input,
                                cfg.cutoff_inputs, _vjp_emit, bwd_dtype)
        emb = pe_fn(x_freq, x, w)
        return emb.reshape(*emb.shape[:-2],
                           emb.shape[-2] * emb.shape[-1]), w

    # (..., NF, D) sin/cos; low-precision emission + backward when asked
    if out_dtype is not None:
        w = w.astype(out_dtype)
        x = x.astype(out_dtype)
        sin, cos = _make_sincos_pe(cfg.freq_bands(), out_dtype)(x_freq)
    else:
        inputs_freq = fb[:, None] * x_freq[..., None, :]
        sin, cos = jnp.sin(inputs_freq), jnp.cos(inputs_freq)
    # stack (sin, cos) pairs f-major: (..., NF, 2, D) -> (..., 2NF, D)
    emb = jnp.stack([sin, cos], axis=-2)
    emb = emb.reshape(*emb.shape[:-3], 2 * NF, emb.shape[-1])
    sched = _schedule_w(cfg, alpha)
    emb = emb * (sched.astype(out_dtype) if out_dtype is not None else sched)

    # `inputs` may carry broadcast batch dims (e.g. view encodings are
    # (R, 1, D) while dists are (R, S, J)): the window multiply broadcasts,
    # and concat operands are broadcast to a common batch shape first.
    def _cat_input(x_block, e):
        xb = x_block[..., None, :]
        batch = jnp.broadcast_shapes(xb.shape[:-2], e.shape[:-2])
        xb = jnp.broadcast_to(xb, batch + xb.shape[-2:])
        e = jnp.broadcast_to(e, batch + e.shape[-2:])
        return jnp.concatenate([xb, e], axis=-2)

    if cfg.include_input and cfg.cutoff_inputs:
        emb = _cat_input(x, emb)
        emb = emb * w
    elif cfg.include_input:
        emb = emb * w
        emb = _cat_input(x, emb)
    else:
        emb = emb * w

    if cfg.normalize:
        # normalize each 3-vector block; zero where the window is closed
        # (cutoff_embedder.py:161-171). Assumes D = 3 * n_blocks.
        sh = emb.shape
        e3 = emb.reshape(-1, 3)
        is_zero = jnp.isclose(w.reshape(-1, w.shape[-1])[:, :1], 0.0,
                              atol=1e-6)
        e3 = e3 / jnp.maximum(jnp.linalg.norm(e3, axis=-1, keepdims=True),
                              1e-12)
        # broadcast is_zero per (row of w) across the (K, D/3) blocks
        emb = e3.reshape(sh)
        zero_mask = jnp.isclose(w, 0.0, atol=1e-6)
        emb = jnp.where(zero_mask, 0.0, emb)

    return emb.reshape(*emb.shape[:-2], emb.shape[-2] * emb.shape[-1]), w


def _embed_plain(cfg: EmbedConfig, inputs: jnp.ndarray) -> jnp.ndarray:
    """Classic NeRF PE: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]
    (cutoff_embedder.py:15-46)."""
    parts = []
    if cfg.include_input:
        parts.append(inputs)
    for f in cfg.freq_bands():
        parts.append(jnp.sin(inputs * f))
        parts.append(jnp.cos(inputs * f))
    if not parts:
        return inputs[..., :0]
    return jnp.concatenate(parts, axis=-1)


def make_embedder(multires: int, input_dims: int = 3, i_embed: int = 0,
                  cutoff_kwargs: Optional[dict] = None
                  ) -> Tuple[Optional[EmbedConfig], int]:
    """Factory mirroring get_embedder (cutoff_embedder.py:199-224).

    Returns (EmbedConfig or None for identity, out_dim).
    """
    if i_embed == -1:
        return None, input_dims
    kwargs = dict(input_dims=input_dims, num_freqs=multires,
                  include_input=True, log_sampling=True)
    if cutoff_kwargs and cutoff_kwargs.get('cutoff', False):
        ck = dict(cutoff_kwargs)
        ck.pop('cutoff', None)
        ck.pop('cutoff_dist', None)      # runtime array, not config
        ck.pop('opt_cutoff', None)       # cutoff_dist is never trainable in
                                         # the reference (requires_grad=False,
                                         # cutoff_embedder.py:91-92)
        if 'normalize_cutoff' in ck:
            ck['normalize'] = ck.pop('normalize_cutoff')
        cfg = EmbedConfig(cutoff=True, **kwargs, **ck)
    else:
        cfg = EmbedConfig(cutoff=False, **kwargs)
    return cfg, cfg.out_dim
