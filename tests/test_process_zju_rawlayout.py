"""ZJU-MoCap import dry-run: the NeuralBody raw subject dir (annots.npy +
per-camera frames + mask/mask_cihp + EasyMocap params) -> process_zju_data
-> catalog ZJUMocapDataset -> train steps -> validation render.

Raw layout per reference core/load_zju.py:400-534; SMPL shape handling runs
through the precomputed joint tables instead of smplx.
"""
import h5py
import numpy as np
import pytest

from rawlayout import build_zju_raw, converter_smoke_train, tiny_train_args


@pytest.fixture(scope='module')
def raw_root(tmp_path_factory):
    return build_zju_raw(str(tmp_path_factory.mktemp('zju_raw')))


def test_zju_convert_and_train(raw_root, smpl_tables_env, tmp_path,
                               monkeypatch):
    from anerf_tpu.data.process_zju import process_zju_data

    out = process_zju_data(raw_root, subject='377', split='train',
                           training_view=(0, 2))
    with h5py.File(out, 'r') as f:
        n = f['imgs'].shape[0]
        assert n == 3 * 2                       # 3 frames x 2 training views
        assert f['imgs'].shape[1] == 64 * 64
        # every image has person pixels and the converter found masks in
        # both mask/ and mask_cihp/
        assert (f['masks'][:].sum(1) > 0).all()
        assert f['kp3d'].shape[1:] == (24, 3)
        assert f['skts'].shape[1:] == (24, 4, 4)
        assert f['rest_pose'].shape == (24, 3)
        assert f['centers'].shape[1:] == (2,)
        assert f['focals'].shape[1:] == (2,)    # dual fx/fy
        kp_idxs = f['kp_idxs'][:]
        cam_idxs = f['img_pose_indices'][:]
        assert set(np.unique(cam_idxs)) == {0, 2}
        assert set(np.unique(kp_idxs)) == {0, 1, 2}
        bkgds = f['bkgds'][:]
        assert bkgds.shape[0] == 3              # per-camera median plates
        assert np.isfinite(f['c2ws'][:]).all()

    # catalog path: data/zju_mocap/377_train_h5py.h5 relative to cwd
    import os
    monkeypatch.chdir(raw_root)
    if not os.path.exists('data/zju_mocap'):
        os.makedirs('data', exist_ok=True)
        os.symlink(os.path.join(raw_root, 'zju_mocap'), 'data/zju_mocap')
    args = tiny_train_args(tmp_path, 'zju', '377')
    ds, val = converter_smoke_train(args)
    assert ds.kp3d.shape == (3, 24, 3)


def test_zju_test_split(raw_root, smpl_tables_env):
    """The held-out-camera split (views not in training_view)."""
    from anerf_tpu.data.process_zju import process_zju_data
    # NUM_TRAIN_FRAMES['377'] is 300; the tiny fixture has 3 frames, so
    # rewind the test window start (i0 = begin + 300) onto frame 2
    out = process_zju_data(raw_root, subject='377', split='test',
                           training_view=(0, 2), begin_ith_frame=-298,
                           i_intv=1)
    with h5py.File(out, 'r') as f:
        assert set(np.unique(f['img_pose_indices'][:])) == {1}
