"""Render-mode pose/camera builders + marching tetrahedra."""
import numpy as np
import pytest

from anerf_tpu.render.modes import (PoseSource, generate_bullet_time,
                                    load_bubble, load_bullettime,
                                    load_interpolate, load_pose_rotate,
                                    load_selected, load_retarget)
from anerf_tpu.skeleton import smpl_rest_pose


@pytest.fixture
def src(rng):
    n = 6
    rest = (smpl_rest_pose * 0.3).astype(np.float32)
    bones = (rng.normal(size=(n, 24, 3)) * 0.2).astype(np.float32)
    kps = rng.normal(size=(n, 24, 3)).astype(np.float32)
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    c2ws[:, 2, 3] = 3.0
    focals = np.full((n,), 100.0, np.float32)
    return PoseSource(kps=kps, bones=bones, c2ws=c2ws, focals=focals,
                      rest_pose=rest)


def test_generate_bullet_time():
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    out = generate_bullet_time(c2w, n_views=8)
    assert out.shape == (8, 4, 4)
    np.testing.assert_allclose(out[0], c2w, atol=1e-6)
    # camera distance preserved under rotation
    d = np.linalg.norm(out[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d, 3.0, atol=1e-5)


def test_load_selected(src):
    out = load_selected(src, np.array([0, 2, 4]))
    assert out['kp3d'].shape == (3, 24, 3)
    assert out['skts'].shape == (3, 24, 4, 4)
    assert out['c2ws'].shape == (3, 4, 4)
    # root of FK'd kps = original root
    np.testing.assert_allclose(out['kp3d'][:, 0], src.kps[[0, 2, 4], 0],
                               atol=1e-5)


def test_load_bullettime(src):
    out = load_bullettime(src, np.array([1, 3]), n_bullet=5)
    assert out['c2ws'].shape == (10, 4, 4)
    assert out['kp3d'].shape == (10, 24, 3)
    assert out['cam_idxs'].shape == (10,)
    # pose repeats per bullet step; centered kps -> root at origin
    np.testing.assert_allclose(out['kp3d'][0], out['kp3d'][4], atol=1e-6)
    np.testing.assert_allclose(out['kp3d'][0, 0], 0.0, atol=1e-5)


def test_load_interpolate(src):
    out = load_interpolate(src, np.array([0, 1]), n_step=4)
    # 1 transition * 4 steps + final pose
    assert out['kp3d'].shape == (5, 24, 3)
    assert (out['c2ws'] == out['c2ws'][0]).all()


def test_load_interpolate_joint_subset(src):
    joints = [18, 19]
    out = load_interpolate(src, np.array([0, 1]), n_step=3, joints=joints)
    bones = out['bones']
    # non-animated joints stay at the first pose's bones
    fixed = [j for j in range(24) if j not in joints]
    for b in bones:
        np.testing.assert_allclose(b[fixed], src.bones[0][fixed], atol=1e-6)


def test_load_bubble(src):
    out = load_bubble(src, np.array([0, 1]), n_step=4)
    assert out['c2ws'].shape == (8, 4, 4)
    assert out['kp3d'].shape == (8, 24, 3)


def test_load_pose_rotate(src):
    out = load_pose_rotate(src, np.array([2]), n_bullet=9)
    assert out['kp3d'].shape == (9, 24, 3)
    # non-root bones unchanged
    np.testing.assert_allclose(out['bones'][:, 1:],
                               np.repeat(src.bones[2:3, 1:], 9, 0), atol=1e-6)


def test_load_retarget(src, rng):
    other = PoseSource(kps=src.kps[::-1].copy(), bones=src.bones[::-1].copy(),
                       c2ws=src.c2ws, focals=src.focals,
                       rest_pose=src.rest_pose)
    out = load_retarget(src, other, np.array([0, 2]), length=1)
    assert out['kp3d'].shape == (2, 24, 3)


def test_marching_tetrahedra_sphere():
    from anerf_tpu.utils.marching import (compute_vertex_normals,
                                          marching_tetrahedra, save_ply,
                                          load_ply)
    n = 24
    t = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(t, t, t, indexing='ij')
    vol = 1.0 - np.sqrt(x ** 2 + y ** 2 + z ** 2)  # sphere radius 1
    verts, faces = marching_tetrahedra(vol, 0.5)  # iso at radius 0.5
    assert len(verts) > 100 and len(faces) > 100
    # verts lie near the r=0.5 sphere (in voxel coords, center (n-1)/2)
    c = (n - 1) / 2
    r = np.linalg.norm(verts - c, axis=-1) * (2.0 / (n - 1))
    assert np.abs(r - 0.5).max() < 0.1
    normals = compute_vertex_normals(verts, faces)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0,
                               atol=1e-5)


def test_ply_roundtrip(tmp_path):
    from anerf_tpu.utils.marching import load_ply, save_ply
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    p = str(tmp_path / 'tri.ply')
    save_ply(p, verts, faces)
    v2, f2 = load_ply(p)
    np.testing.assert_allclose(v2, verts)
    np.testing.assert_array_equal(f2, faces)
