"""Human3.6M import dry-run: the authors' pack trio (SPIN h5 + DeepLab mask
pack + clean/chair background stacks + frame jpgs) -> process_h36m_data ->
catalog H36MDataset (multiview kp sharing, sequence val split) -> train ->
validation render.

Raw layout per reference core/load_h36m.py:114-243.
"""
import os

import h5py
import numpy as np
import pytest

from rawlayout import (build_h36m_raw, converter_smoke_train,
                       tiny_train_args)


@pytest.fixture(scope='module')
def raw_root(tmp_path_factory):
    return build_h36m_raw(str(tmp_path_factory.mktemp('h36m_raw')))


def test_h36m_convert_and_train(raw_root, smpl_tables_env, tmp_path,
                                monkeypatch):
    from anerf_tpu.data.process_h36m import process_h36m_data

    out = process_h36m_data(raw_root, subject='S9')
    assert out.endswith('S9_processed_h5py.h5')
    with h5py.File(out, 'r') as f:
        n = f['imgs'].shape[0]
        assert n == 2 * 4 * 2                # 2 seqs x 4 cams x 2 poses
        # chair-free fixture: bkgd idx = camera idx (4 cameras)
        assert set(np.unique(f['bkgd_idxs'][:])) == {0, 1, 2, 3}
        assert f['bkgds'].shape[0] == 8      # clean + chair stacks
        assert (f['masks'][:].max() == 1)    # label {0,2} -> binary
        assert (f['sampling_masks'][:].sum(1)
                >= f['masks'][:].sum(1)).all()
        paths = [p.decode() for p in f['img_paths'][:]]
        assert paths[0].split('/')[1] == 'Directions-1'

    monkeypatch.chdir(raw_root)
    os.makedirs('data', exist_ok=True)
    if not os.path.exists('data/h36m'):
        os.symlink(raw_root, 'data/h36m')
    # multiview + use_val: exercises map_data_to_n_views + the
    # 'Walking-' sequence val split
    args = tiny_train_args(tmp_path, 'h36m', 'S9', multiview=True,
                           use_val=True)
    ds, val = converter_smoke_train(args)
    assert len(ds.get_render_data()['imgs']) > 0
    # train split dropped the Walking-1 (val) sequence
    assert ds.data_len == 8
    # shared non-root pose across the 4 views of a pose
    assert ds.kp_map is not None


def test_h36m_val_split(raw_root, smpl_tables_env, monkeypatch):
    from anerf_tpu.data.h36m import H36MDataset
    out = os.path.join(raw_root, 'S9_processed_h5py.h5')
    ds = H36MDataset(out, N_samples=8, split='val', subject='S9',
                     load_refined=False)
    assert ds.data_len == 8                  # the Walking-1 frames
