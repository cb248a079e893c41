"""Rotation conversions vs scipy oracles and round-trip identities."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from anerf_tpu.ops import rotations as R


def test_axisang_to_rot_matches_scipy(rng):
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    want = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_axisang_to_rot_zero_angle():
    aa = np.zeros((4, 3), dtype=np.float32)
    got = np.asarray(R.axisang_to_rot(jnp.asarray(aa)))
    np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (4, 3, 3)),
                               atol=1e-6)


def test_rot_to_axisang_roundtrip(rng):
    aa = rng.normal(size=(128, 3)).astype(np.float32)
    # keep |angle| < pi for unique representation
    norm = np.linalg.norm(aa, axis=-1, keepdims=True)
    aa = aa / np.maximum(norm, 1e-9) * (norm % 3.0)
    rot = R.axisang_to_rot(jnp.asarray(aa))
    back = np.asarray(R.rot_to_axisang(rot))
    got = Rotation.from_rotvec(back).as_matrix()
    want = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rot6d_roundtrip(rng):
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    rot = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
    r6 = np.asarray(R.rot_to_rot6d(jnp.asarray(rot)))
    assert r6.shape == (64, 6)
    # reference layout: rot[..., :3, :2] flattened row-major
    np.testing.assert_allclose(r6, rot[..., :3, :2].reshape(64, 6))
    back = np.asarray(R.rot6d_to_rot(jnp.asarray(r6)))
    np.testing.assert_allclose(back, rot, atol=1e-5)


def test_rot6d_gram_schmidt_on_noisy_input(rng):
    x = rng.normal(size=(32, 6)).astype(np.float32)
    rot = np.asarray(R.rot6d_to_rot(jnp.asarray(x)))
    # must be orthonormal with det +1
    eye = np.einsum('bij,bkj->bik', rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)


def test_quat_matches_scipy(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(R.axisang_to_quat(jnp.asarray(aa)))
    want = Rotation.from_rotvec(aa).as_quat()  # (x, y, z, w)
    want = np.concatenate([want[:, 3:], want[:, :3]], -1)
    # sign-canonicalize
    want = np.where(want[:, :1] < 0, -want, want)
    got = np.where(got[:, :1] < 0, -got, got)
    np.testing.assert_allclose(got, want, atol=1e-5)
