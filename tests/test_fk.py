"""Forward kinematics vs an independent numpy oracle."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from anerf_tpu.ops.fk import fk, get_smpl_l2ws_np, rigid_inverse
from anerf_tpu.skeleton import SMPLSkeleton, smpl_rest_pose


def oracle_fk(pose, rest, pelvis=None):
    """Sequential-recursion FK oracle (per sample)."""
    J = rest.shape[0]
    rots = Rotation.from_rotvec(pose).as_matrix()
    l2w = [None] * J
    for j in range(J):
        parent = SMPLSkeleton.joint_trees[j]
        m = np.eye(4, dtype=np.float64)
        if j == SMPLSkeleton.root_id:
            m[:3, :3] = rots[j]
            m[:3, 3] = rest[j]
            l2w[j] = m
        else:
            m[:3, :3] = rots[j]
            m[:3, 3] = rest[j] - rest[parent]
            l2w[j] = l2w[parent] @ m
    l2w = np.stack(l2w)
    if pelvis is not None:
        l2w[:, :3, 3] += pelvis
    return l2w


def test_fk_matches_oracle(rng):
    N, J = 4, 24
    bones = (rng.normal(size=(N, J, 3)) * 0.5).astype(np.float32)
    pelvis = rng.normal(size=(N, 3)).astype(np.float32)
    rest = smpl_rest_pose * 0.0025

    kp3d, skts, l2ws, rots = fk(jnp.asarray(bones), jnp.asarray(rest),
                                jnp.asarray(pelvis))
    for n in range(N):
        want = oracle_fk(bones[n], rest, pelvis[n])
        np.testing.assert_allclose(np.asarray(l2ws[n]), want, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kp3d[n]), want[:, :3, 3],
                                   atol=1e-5)
        # skts invert l2ws
        prod = np.asarray(skts[n]) @ want
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4),
                                                         (J, 4, 4)), atol=1e-4)


def test_fk_np_matches_jax(rng):
    pose = (rng.normal(size=(24, 3)) * 0.4).astype(np.float32)
    l2w_np = get_smpl_l2ws_np(pose, scale=1.0)
    kp, skts, l2w_j, _ = fk(jnp.asarray(pose)[None],
                            jnp.asarray(smpl_rest_pose))
    np.testing.assert_allclose(np.asarray(l2w_j[0]), l2w_np, atol=1e-5)


def test_rigid_inverse(rng):
    aa = rng.normal(size=(8, 3)).astype(np.float32)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    m = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    m[:, :3, :3] = Rotation.from_rotvec(aa).as_matrix()
    m[:, :3, 3] = t
    inv = np.asarray(rigid_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.broadcast_to(np.eye(4), (8, 4, 4)),
                               atol=1e-5)


def test_fk_6d_matches_axisang(rng):
    from anerf_tpu.ops.rotations import axisang_to_rot, rot_to_rot6d
    N, J = 3, 24
    bones = (rng.normal(size=(N, J, 3)) * 0.5).astype(np.float32)
    rest = smpl_rest_pose * 0.0025
    b6 = rot_to_rot6d(axisang_to_rot(jnp.asarray(bones)))
    kp_a, _, _, _ = fk(jnp.asarray(bones), jnp.asarray(rest))
    kp_b, _, _, _ = fk(b6, jnp.asarray(rest))
    np.testing.assert_allclose(np.asarray(kp_a), np.asarray(kp_b), atol=1e-5)
