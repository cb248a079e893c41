"""Skeleton-relative input encoders, functional jnp.

Re-design of reference core/encoders.py. Encoders are pure functions selected
at config time (the reference uses nn.Module subclasses dispatched by string
flags, core/raycasters.py:251-305). The world->local transform is one einsum
over the (rays, samples, joints) lattice instead of expand/transpose/bmm.

Shapes throughout: pts (R, S, 3), skts (R, J, 4, 4), kps (R, J, 3),
rays_d (R, 1, 3). All static under jit.

Every geometry einsum here runs at precision='highest': TPU default
precision executes f32 matmuls as a SINGLE bf16 MXU pass, and a 4e-3
relative truncation on a local coordinate becomes 2^k * 4e-3 of PE angle
error at frequency band k (and flips tau=2000 sigmoid cutoff windows).
Measured on-chip before the fix: encoded-feature error up to 0.32 abs at
tau=2000; after: at the intended bf16-output numerics (~4e-3). See
tools/pe_fidelity.py and PERF.md round 4. These einsums are tiny
(per-ray/per-joint) next to the per-point MLP, so the extra passes are
free.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

from ..skeleton import Skeleton, SMPLSkeleton


def transform_batch_pts(pts: jnp.ndarray, skts: jnp.ndarray) -> jnp.ndarray:
    """World points -> per-joint local coordinates.

    pts (R, S, 3), skts (R, J, 4, 4) -> (R, S, J, 3)
    (reference core/encoders.py:8-23).
    """
    rot = skts[..., :3, :3]       # (R, J, 3, 3)
    trans = skts[..., :3, 3]      # (R, J, 3)
    # out[r,s,j,a] = sum_b rot[r,j,a,b] * pts[r,s,b] + trans[r,j,a]
    out = jnp.einsum('rjab,rsb->rsja', rot, pts, precision='highest')
    return out + trans[:, None]


def transform_batch_pts_flat(pts: jnp.ndarray, skts: jnp.ndarray
                             ) -> jnp.ndarray:
    """Same transform, flat (R, S, J*3) output in joint-major layout.

    On TPU the (R, S, J, 3) layout puts the 3-vector on the lane axis
    (3/128 utilization); this variant keeps J*3 contiguous lanes:
    out[r, s, j*3+a] = sum_b skts[r, j, a, b] * pts[r, s, b] + t[r, j, a]
    lowered as one batched (S, 3) @ (3, J*3) matmul per ray.
    """
    R, J = skts.shape[0], skts.shape[1]
    rot_cols = skts[..., :3, :3].transpose(0, 3, 1, 2).reshape(R, 3, J * 3)
    trans = skts[..., :3, 3].reshape(R, 1, J * 3)
    return jnp.einsum('rsb,rbc->rsc', pts, rot_cols,
                      precision='highest') + trans


def _group3_sumsq(x_flat: jnp.ndarray, J: int) -> jnp.ndarray:
    """Sum of squares over consecutive triples: (..., J*3) -> (..., J).

    Implemented as a matmul against a 0/1 grouping matrix so the reduction
    stays lane-parallel (a reshape to (..., J, 3) would put the 3 on lanes).
    """
    G = jnp.zeros((J * 3, J), x_flat.dtype)
    idx = jnp.arange(J * 3)
    G = G.at[idx, idx // 3].set(1.0)
    return jnp.einsum('...c,cj->...j', x_flat * x_flat, G,
                      precision='highest')


def _expand3(x: jnp.ndarray, J: int) -> jnp.ndarray:
    """(..., J) -> (..., J*3) joint-major repeat via a 0/1 matmul."""
    E = jnp.zeros((J, J * 3), x.dtype)
    idx = jnp.arange(J * 3)
    E = E.at[idx // 3, idx].set(1.0)
    return jnp.einsum('...j,jc->...c', x, E, precision='highest')


def transform_batch_rays(rays_d: jnp.ndarray, skts: jnp.ndarray) -> jnp.ndarray:
    """Ray directions -> per-joint local frame (rotation only).

    rays_d (R, S, 3), skts (R, J, 4, 4) -> (R, S, J, 3)
    (reference core/encoders.py:25-37).
    """
    rot = skts[..., :3, :3]
    return jnp.einsum('rjab,rsb->rsja', rot, rays_d, precision='highest')


def _normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def calculate_angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle between vectors minus pi/2 (reference skeleton_utils.py:594-605)."""
    dot = jnp.sum(a * b, -1)
    cos = dot / jnp.maximum(jnp.linalg.norm(a, axis=-1)
                            * jnp.linalg.norm(b, axis=-1), 1e-12)
    cos = jnp.clip(cos, -1.0 + 1e-6, 1.0 - 1e-6)
    return jnp.arccos(cos) - 0.5 * np.pi


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    """Static description of one encoder: its callable and output width."""
    name: str
    dims: int
    fn: Callable = dataclasses.field(compare=False, hash=False, repr=False,
                                     default=None)

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)


# ----- keypoint (v) encoders: (pts, pts_t, kps) -> (R, S, dims) -----

def make_kp_encoder(kind: str, skel: Skeleton = SMPLSkeleton
                    ) -> Tuple[EncoderSpec, int, int]:
    """Returns (spec, input_dims, cutoff_dims).

    Mirrors get_kp_input_fn (core/raycasters.py:251-270).
    """
    J = skel.n_joints

    if kind == 'reldist':
        def fn(pts, pts_t, kps):
            if pts_t is not None:
                return jnp.linalg.norm(pts_t, axis=-1)
            return jnp.linalg.norm(pts[:, :, None] - kps[:, None], axis=-1)
        spec = EncoderSpec('RelDist', J, fn)
        return spec, J, J
    if kind == 'relpos':
        def fn(pts, pts_t, kps):
            if pts_t is not None:
                return pts_t.reshape(*pts_t.shape[:-2], J * 3)
            rel = pts[:, :, None] - kps[:, None]
            return rel.reshape(*rel.shape[:-2], J * 3)
        spec = EncoderSpec('RelPos', J * 3, fn)
        return spec, J * 3, J
    if kind == 'cat':
        def fn(pts, pts_t, kps):
            kpe = jnp.broadcast_to(kps[:, None],
                                   pts.shape[:2] + kps.shape[-2:])
            kpe = kpe.reshape(*pts.shape[:2], J * 3)
            return jnp.concatenate([pts, kpe], axis=-1)
        spec = EncoderSpec('KPCat', J * 3 + 3, fn)
        return spec, J * 3 + 3, J
    if kind == 'querypts':
        def fn(pts, pts_t, kps):
            return pts
        spec = EncoderSpec('Identity', 3, fn)
        return spec, 3, 3
    raise NotImplementedError(f'kp_dist_type {kind} not implemented')


# ----- bone (r) encoders: (pts_t, bones) -> (R, S, dims) -----

def make_bone_encoder(kind: str, skel: Skeleton = SMPLSkeleton
                      ) -> Tuple[EncoderSpec, int]:
    """Mirrors get_bone_input_fn (core/raycasters.py:288-305)."""
    J = skel.n_joints
    if kind == 'reldir':
        def fn(pts_t, bones=None, refs=None):
            n = _normalize(pts_t)
            return n.reshape(*n.shape[:2], -1)
        return EncoderSpec('VecNorm', J * 3, fn), J * 3
    if kind == 'axisang':
        def fn(pts_t, bones=None, refs=None):
            R, S = refs.shape[:2] if refs is not None else pts_t.shape[:2]
            b = bones.reshape(R, 1, -1)
            return jnp.broadcast_to(b, (R, S, b.shape[-1]))
        return EncoderSpec('IdentityExpand', J * 3, fn), J * 3
    if kind == 'Nope':
        return EncoderSpec('Nope', 0, lambda *a, **k: None), 0
    raise NotImplementedError(f'bone_type {kind} not implemented')


# ----- view (d) encoders: (rays_t, pts_t) -> (R, S, dims) -----

def make_view_encoder(kind: str, skel: Skeleton = SMPLSkeleton
                      ) -> Tuple[EncoderSpec, int]:
    """Mirrors get_view_input_fn (core/raycasters.py:272-286)."""
    J = skel.n_joints
    if kind == 'relray':
        def fn(rays_t, pts_t=None, refs=None):
            n = _normalize(rays_t)
            n = n.reshape(*n.shape[:2], -1)  # (R, 1, J*3)
            if refs is not None:
                n = jnp.broadcast_to(n, refs.shape[:2] + (n.shape[-1],))
            return n
        return EncoderSpec('VecNorm', J * 3, fn), J * 3
    if kind == 'rayangle':
        def fn(rays_t, pts_t=None, refs=None):
            return calculate_angle(pts_t, rays_t)
        return EncoderSpec('RayAng', J, fn), J
    if kind == 'world':
        def fn(rays_t, pts_t=None, refs=None):
            R, S = refs.shape[:2]
            r = rays_t.reshape(R, 1, -1)
            return jnp.broadcast_to(r, (R, S, r.shape[-1]))
        return EncoderSpec('IdentityExpand', 3, fn), 3
    raise NotImplementedError(f'view_type {kind} not implemented')
