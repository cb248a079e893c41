"""Utility coverage: mesh renderer, eval helpers, metrics, camera paths."""
import json
import os

import numpy as np
import pytest


def test_mesh_turntable_render():
    from anerf_tpu.utils.marching import marching_tetrahedra
    from anerf_tpu.utils.mesh_render import render_turntable

    n = 20
    t = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(t, t, t, indexing='ij')
    vol = 1.0 - np.sqrt(x ** 2 + y ** 2 + z ** 2)
    verts, faces = marching_tetrahedra(vol, 0.4)
    frames = render_turntable(verts, faces, step_deg=90.0, res=64)
    assert frames.shape == (4, 64, 64, 3)
    # sphere silhouette: center pixels covered, corners background
    assert (frames[0, 32, 32] != 1.0).any()
    np.testing.assert_allclose(frames[0, 0, 0], 1.0)


def test_psnr_ssim_sanity(rng):
    from anerf_tpu.utils.metrics import psnr, ssim
    img = rng.uniform(size=(64, 64, 3))
    assert psnr(img, img) == float('inf')
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(size=img.shape) * 0.1, 0, 1)
    p = psnr(noisy, img)
    assert 15 < p < 30
    assert ssim(noisy, img) < 0.99


def test_procrustes_alignment(rng):
    from anerf_tpu.utils.metrics import pa_mpjpe, procrustes
    from scipy.spatial.transform import Rotation
    X = rng.normal(size=(24, 3))
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    Y = 2.0 * X @ R.T + np.array([1.0, -2.0, 0.5])
    Z, tform = procrustes(X, Y)
    np.testing.assert_allclose(Z, X, atol=1e-8)
    # PA-MPJPE of a similarity-transformed pose is ~0
    assert pa_mpjpe(Y[None], X[None]) < 1e-8


def test_mpjpe_mm_scaling(rng):
    from anerf_tpu.utils.eval_helpers import evaluate_pose_error
    gt = rng.normal(size=(4, 24, 3)).astype(np.float32)
    pred = gt + 0.001  # 1 unit of ext_scale=0.001 == 1 mm... offset 0.001
    out = evaluate_pose_error(pred, gt, ext_scale=0.001)
    np.testing.assert_allclose(out['mpjpe_mm'], np.sqrt(3), rtol=1e-4)


def test_metrics_jsonl_roundtrip(tmp_path):
    from anerf_tpu.utils.eval_helpers import read_metrics_jsonl
    from anerf_tpu.utils.logging import MetricsLogger
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log_scalars(10, {'psnr': 21.5, 'loss': 0.1})
    logger.log_scalars(20, {'psnr': 25.0}, prefix='val/')
    logger.close()
    recs = read_metrics_jsonl(os.path.join(str(tmp_path), 'metrics.jsonl'))
    assert recs[0]['step'] == 10 and recs[0]['psnr'] == 21.5
    assert recs[1]['val/psnr'] == 25.0


def test_metric_txt_dumps(tmp_path, rng):
    from anerf_tpu.utils.eval_helpers import evaluate_metric
    rgbs = rng.uniform(size=(2, 32, 32, 3))
    out = evaluate_metric(rgbs, rgbs, outdir=str(tmp_path))
    assert out['psnr'] == float('inf')
    assert os.path.exists(os.path.join(str(tmp_path), 'psnr.txt'))
    lines = open(os.path.join(str(tmp_path), 'psnr.txt')).read().splitlines()
    assert lines[-1].startswith('mean')


def test_generate_camera_path():
    from anerf_tpu.render.modes import generate_camera_path
    poses = generate_camera_path(n_cams=12, dist=3.0)
    assert poses.shape == (24, 4, 4)
    # ring 1 cameras stay near radius ~3 (+- zoom amplitude)
    d = np.linalg.norm(poses[:12, :3, 3], axis=-1)
    assert (np.abs(d - 3.0) < 0.6).all()
    # rotations are orthonormal
    R = poses[:, :3, :3]
    eye = np.einsum('bij,bkj->bik', R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)


def test_skeleton_draw(rng):
    from anerf_tpu.utils.skeleton_draw import draw_skeletons_3d
    from anerf_tpu.skeleton import smpl_rest_pose
    img = np.zeros((2, 64, 64, 3), np.uint8)
    kps = np.stack([smpl_rest_pose * 0.3] * 2)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 3.0
    out = draw_skeletons_3d(img, kps, np.stack([c2w] * 2), 64, 64, 80.0)
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
