"""Mesh-free SMPL joint tables vs a direct LBS oracle.

The oracle below implements smplx's lbs() algorithm verbatim-in-numpy
(shape blendshapes, pose blendshapes, rigid FK, linear blend skinning,
then a vertex-space joint regressor — reference SMPLEvalHelper,
core/utils/evaluation_helpers.py:525-537, and the smplx SMPL forward the
reference calls in core/process_spin.py:110-127). The tables path in
anerf_tpu/data/smpl_tables.py must match it exactly: same numbers,
without ever materializing the (V, 3) mesh.
"""
import os
import pickle

import numpy as np
import pytest

from anerf_tpu.data import smpl_tables as st
from anerf_tpu.skeleton import SMPLSkeleton

J = 24
B = 10
V = 61   # deliberately non-round
K = 17
P = (J - 1) * 9


def _synth_model(seed=0):
    """A random but valid SMPL-shaped model (vertices near the joints so
    the regressor rows are physically sensible convex-ish combos)."""
    rng = np.random.default_rng(seed)
    # rest joints roughly human-scaled
    j_rest = rng.normal(0, 0.3, (J, 3))
    # each vertex hangs off one joint
    owner = rng.integers(0, J, V)
    v_template = j_rest[owner] + rng.normal(0, 0.05, (V, 3))
    # skinning weights: mostly the owner, some of its parent
    weights = np.zeros((V, J))
    parents = np.asarray(SMPLSkeleton.joint_trees)
    w = rng.uniform(0.6, 1.0, V)
    weights[np.arange(V), owner] = w
    weights[np.arange(V), parents[owner]] += 1.0 - w
    weights /= weights.sum(1, keepdims=True)
    # a consistent regressor: each joint averages its own vertices
    Jr = np.zeros((J, V))
    for j in range(J):
        mine = np.flatnonzero(owner == j)
        if len(mine) == 0:
            # give joints with no vertex a nearest-vertex row
            mine = [int(np.argmin(np.linalg.norm(v_template - j_rest[j],
                                                 axis=1)))]
        Jr[j, mine] = 1.0 / len(mine)
    shapedirs = rng.normal(0, 0.02, (V, 3, B))
    posedirs = rng.normal(0, 0.005, (V, 3, P))
    Jx = rng.dirichlet(np.ones(V) * 0.2, K)  # (K, V) extra regressor
    return dict(v_template=v_template, shapedirs=shapedirs,
                posedirs=posedirs, J_regressor=Jr, weights=weights), Jx


def _lbs_oracle(model, Jx, betas, rots):
    """smplx.lbs in plain numpy: returns (joints_rest, regressed)."""
    v_shaped = model['v_template'] + model['shapedirs'] @ betas      # (V,3)
    j_rest = model['J_regressor'] @ v_shaped                         # (J,3)
    pose_feat = (rots[1:] - np.eye(3)).reshape(-1)                   # (P,)
    v_posed = v_shaped + model['posedirs'] @ pose_feat
    # rigid transforms down the tree
    parents = np.asarray(SMPLSkeleton.joint_trees)

    def tmat(R, t):
        m = np.eye(4)
        m[:3, :3], m[:3, 3] = R, t
        return m

    G = np.zeros((J, 4, 4))
    G[0] = tmat(rots[0], j_rest[0])
    for j in range(1, J):
        G[j] = G[parents[j]] @ tmat(rots[j], j_rest[j] - j_rest[parents[j]])
    # remove the rest-pose joint locations (smplx's A = G - pad(G R j))
    A = G.copy()
    A[:, :3, 3] -= np.einsum('jab,jb->ja', G[:, :3, :3], j_rest)
    T = np.einsum('vj,jab->vab', model['weights'], A)                # (V,4,4)
    verts = np.einsum('vab,vb->va', T[:, :3, :3], v_posed) + T[:, :3, 3]
    return j_rest, Jx @ verts                                        # (K,3)


@pytest.fixture(scope='module')
def tables_npz(tmp_path_factory):
    model, Jx = _synth_model()
    d = tmp_path_factory.mktemp('smpl')
    pkl = str(d / 'SMPL_TEST.pkl')
    reg = str(d / 'J_regressor_h36m.npy')
    with open(pkl, 'wb') as f:
        pickle.dump(model, f)
    np.save(reg, Jx)
    out = st.make_tables_from_smpl_pkl(pkl, str(d / 'tables.npz'),
                                       regressor_npy=reg)
    return model, Jx, out


def test_joints_from_betas_matches_regressor(tables_npz):
    model, Jx, npz = tables_npz
    tables = st.load_tables(npz)
    rng = np.random.default_rng(1)
    betas = rng.normal(0, 1.5, (5, B))
    got = st.joints_from_betas(betas, tables)
    for n in range(5):
        want = model['J_regressor'] @ (model['v_template']
                                       + model['shapedirs'] @ betas[n])
        np.testing.assert_allclose(got[n], want, atol=1e-10)


def test_regress_joints_matches_lbs_oracle(tables_npz):
    from scipy.spatial.transform import Rotation
    model, Jx, npz = tables_npz
    tables = st.load_tables(npz)
    rng = np.random.default_rng(2)
    N = 4
    betas = rng.normal(0, 1.0, (N, B))
    aa = rng.normal(0, 0.4, (N, J, 3))
    rots = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        N, J, 3, 3)
    got = st.regress_joints(betas, rots, tables)
    for n in range(N):
        _, want = _lbs_oracle(model, Jx, betas[n], rots[n])
        # f32 FK inside get_smpl_l2ws_np bounds the tolerance
        np.testing.assert_allclose(got[n], want, atol=5e-5)


def test_regress_joints_translation(tables_npz):
    from scipy.spatial.transform import Rotation
    model, Jx, npz = tables_npz
    tables = st.load_tables(npz)
    rng = np.random.default_rng(3)
    betas = rng.normal(0, 1.0, (2, B))
    rots = Rotation.from_rotvec(
        rng.normal(0, 0.3, (2 * J, 3))).as_matrix().reshape(2, J, 3, 3)
    t = rng.normal(0, 1.0, (2, 3))
    base = st.regress_joints(betas, rots, tables)
    moved = st.regress_joints(betas, rots, tables, transl=t)
    np.testing.assert_allclose(moved, base + t[:, None], atol=1e-12)


def test_load_tables_missing_raises():
    with pytest.raises(st.SMPLTablesMissing):
        st.load_tables('/nonexistent/tables.npz')
    env = dict(os.environ)
    os.environ.pop(st.ENV_VAR, None)
    try:
        with pytest.raises(st.SMPLTablesMissing):
            st.load_tables()
    finally:
        os.environ.clear()
        os.environ.update(env)


def test_rest_pose_from_betas_tables_path(tables_npz):
    """The previously smplx-gated betas->rest-pose path, executed."""
    from anerf_tpu.data.process_spin import rest_pose_from_betas
    model, Jx, npz = tables_npz
    tables = st.load_tables(npz)
    rng = np.random.default_rng(4)
    betas = rng.normal(0, 1.0, (3, B))
    got = rest_pose_from_betas(betas, tables=tables)
    # oracle: regressor joints, root-centered, frame-averaged
    js = np.stack([model['J_regressor'] @ (model['v_template']
                                           + model['shapedirs'] @ b)
                   for b in betas])
    want = (js - js[:, 0:1]).mean(0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rest_pose_from_betas_env_var(tables_npz, monkeypatch):
    from anerf_tpu.data.process_spin import rest_pose_from_betas
    _, _, npz = tables_npz
    monkeypatch.setenv(st.ENV_VAR, npz)
    out = rest_pose_from_betas(np.zeros((1, B)))
    assert out.shape == (J, 3)


def test_evaluate_pampjpe_from_smpl_params(tables_npz):
    """Zero error when GT is the regressed joints under a similarity
    transform (PA) / exact mm copy (MPJPE); nonzero under noise."""
    from scipy.spatial.transform import Rotation

    from anerf_tpu.utils.eval_helpers import (
        evaluate_pampjpe_from_smpl_params)
    model, Jx, npz = tables_npz
    tables = st.load_tables(npz)
    rng = np.random.default_rng(5)
    N = 3
    betas = rng.normal(0, 1.0, (1, B))
    bones = rng.normal(0, 0.3, (N, J, 3))

    rots = Rotation.from_rotvec(bones.reshape(-1, 3)).as_matrix().reshape(
        N, J, 3, 3)
    pred = st.regress_joints(np.repeat(betas, N, 0), rots,
                             tables)[:, st.SPIN_TO_CANON]

    # PA-MPJPE ~ 0 for a rigidly-moved, rescaled (mm) copy of pred
    Rg = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    gt_pa = (pred @ Rg.T) * 1000.0 + np.array([10., 20., -5.])
    # MPJPE ~ 0 needs the exact mm copy (it only removes translation)
    gt_exact = pred * 1000.0
    pa, _ = evaluate_pampjpe_from_smpl_params(gt_pa, betas, bones,
                                              tables=tables)
    _, mp = evaluate_pampjpe_from_smpl_params(gt_exact, betas, bones,
                                              tables=tables)
    assert pa < 1e-6
    assert mp < 1e-6

    pa2, mp2 = evaluate_pampjpe_from_smpl_params(
        gt_exact + rng.normal(0, 30.0, gt_exact.shape), betas, bones,
        tables=tables)
    assert pa2 > 1.0 and mp2 > 1.0
    # ret_kp surface
    _, _, kps = evaluate_pampjpe_from_smpl_params(
        gt_exact, betas, bones, tables=tables, ret_kp=True)
    assert kps.shape == (N, K, 3)
