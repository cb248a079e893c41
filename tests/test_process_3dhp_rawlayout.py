"""MPI-INF-3DHP import dry-run: the multi-subject MPI_SPIN pack +
imageSequence/masks frames + background plate -> process_3dhp_data
(subject filter) -> catalog ThreeDHPDataset (::9 val split, per-subject
camera fixes) -> train -> validation render.

Raw layout per reference core/load_3dhp.py:82-141.
"""
import os

import h5py
import numpy as np
import pytest

from rawlayout import (build_3dhp_raw, converter_smoke_train,
                       tiny_train_args)


@pytest.fixture(scope='module')
def raw_root(tmp_path_factory):
    return build_3dhp_raw(str(tmp_path_factory.mktemp('3dhp_raw')))


def test_3dhp_convert_and_train(raw_root, smpl_tables_env, tmp_path,
                                monkeypatch):
    from anerf_tpu.data.process_3dhp import process_3dhp_data

    out = process_3dhp_data(raw_root, subject='S1')
    with h5py.File(out, 'r') as f:
        n = f['imgs'].shape[0]
        assert n == 6                        # S2 rows filtered out
        assert f['gt_kp3d'].shape == (6, 17, 3)   # pose_3d carried over
        assert (f['masks'][:].max() == 1)
        assert f['bkgds'].shape[0] == 1
        assert np.isfinite(f['c2ws'][:]).all()

    monkeypatch.chdir(raw_root)
    os.makedirs('data', exist_ok=True)
    if not os.path.exists('data/mpi_3dhp'):
        os.symlink(raw_root, 'data/mpi_3dhp')
    args = tiny_train_args(tmp_path, '3dhp', 'S1')
    ds, val = converter_smoke_train(args)
    assert ds.temp_validity[0] == 0


def test_3dhp_s5_camera_fix(raw_root, smpl_tables_env, monkeypatch):
    """S5/S6: dedicated pack location + the /0.82 translation fix."""
    import shutil

    from anerf_tpu.data.mpi3dhp import ThreeDHPDataset
    from anerf_tpu.data.process_3dhp import process_3dhp_data

    s5root = os.path.join(raw_root, 's5run')
    sub = os.path.join(s5root, 'mpi_3dhp')
    os.makedirs(sub, exist_ok=True)
    # S5 reads from mpi_3dhp/3DHP-S5S6.h5 and mpi_3dhp/S5_bkgd.png; frame
    # tree reuses S1's images via the img_path prefix
    if not os.path.exists(os.path.join(s5root, 'S1')):
        os.symlink(os.path.join(raw_root, 'S1'),
                   os.path.join(s5root, 'S1'))
    import rawlayout
    rng = np.random.default_rng(9)
    paths = [f'S1/Seq1/imageSequence/frame_{fr:06d}.png' for fr in range(6)]
    rawlayout.make_spin_pack(os.path.join(sub, '3DHP-S5S6.h5'),
                             [p.replace('S1', 'S5', 1) for p in paths],
                             rng, img_res=(768, 1365))
    # the pack's S5/... paths must resolve on disk
    if not os.path.exists(os.path.join(s5root, 'S5')):
        os.symlink(os.path.join(raw_root, 'S1'), os.path.join(s5root, 'S5'))
    shutil.copy(os.path.join(raw_root, 'S1_bkgd.png'),
                os.path.join(sub, 'S5_bkgd.png'))

    out = process_3dhp_data(s5root, subject='S5')
    with h5py.File(out, 'r') as f:
        raw_t = f['c2ws'][:][..., :3, -1]
    ds = ThreeDHPDataset(out, N_samples=8, split='full', subject='S5')
    np.testing.assert_allclose(ds.c2ws[..., :3, -1], raw_t / 0.82,
                               rtol=1e-6)
