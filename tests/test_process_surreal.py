"""Offline SURREAL processing on a synthetic raw dump."""
import os
import pickle

import numpy as np
import pytest

from anerf_tpu.data.process_surreal import process_surreal_data
from anerf_tpu.data.surreal import SurrealDataset


def make_fake_surreal_dump(root, n_kp=3, n_cams=2, H=32, W=32):
    import imageio.v2 as imageio
    from scipy.io import savemat

    rng = np.random.default_rng(0)
    seq_dir = os.path.join(root, 'run0_seq/')
    sub_dir = os.path.join(seq_dir, '01-01/')
    os.makedirs(os.path.join(sub_dir, 'imageSequences'), exist_ok=True)

    cams = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    cams[:, 2, 3] = 900.0  # mm-scale translation, scaled by ext_scale
    meta = {
        'focal': 40.0, 'int_scale': 1.0, 'render_type': 'run0',
        'cams': cams, 'N_kp': n_kp, 'N_cams': n_cams,
        'N_cam_per_subdir': n_cams,
        'joints3D': rng.normal(size=(n_kp, 24, 3)).astype(np.float32) * 100,
        'poses': (rng.normal(size=(n_kp, 72)) * 0.2).astype(np.float32),
    }
    with open(os.path.join(seq_dir, 'metadata.pkl'), 'wb') as f:
        pickle.dump(meta, f)

    segm = rng.integers(0, 3, size=(n_cams * n_kp, H, W)).astype(np.uint8)
    savemat(os.path.join(sub_dir, 'x_segm.mat'), {'data': segm})

    for i in range(n_cams * n_kp):
        img = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
        imageio.imwrite(
            os.path.join(sub_dir, 'imageSequences', f'img_{i:04d}.png'),
            img)


def test_process_surreal_roundtrip(tmp_path):
    root = str(tmp_path / 'raw')
    os.makedirs(root)
    make_fake_surreal_dump(root)
    h5 = str(tmp_path / 'out_train_h5py.h5')
    data = process_surreal_data(h5, root, extend_iter=1)

    assert data['imgs'].shape == (6, 32, 32, 3)
    assert data['kp3d'].shape == (3, 24, 3)
    assert data['skts'].shape == (3, 24, 4, 4)
    assert data['c2ws'].shape == (6, 4, 4)
    # skts invert to kp positions
    l2w = np.linalg.inv(data['skts'])
    np.testing.assert_allclose(l2w[..., :3, 3], data['kp3d'], atol=1e-4)

    # the produced file loads as a dataset and yields valid batches
    ds = SurrealDataset(h5, N_samples=8, split='train')
    assert len(ds) == 6
    item = ds.get_item(0)
    assert item['rays_o'].shape == (8, 3)
    assert np.isfinite(item['rays_d']).all()
