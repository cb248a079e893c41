"""Mixamo import dry-run: the authors' render dumps (per-sequence
Camera_<c>/Image%04d.png + RGB Masks/ + Camera_0/metadata.pickle gt poses +
the SPIN pack) -> process_mixamo_data -> catalog MixamoDataset (selected
subset, white background, temporal validity) -> train -> validation render.

Raw layout per reference core/load_mixamo.py:14-106.
"""
import os

import h5py
import numpy as np
import pytest

from rawlayout import (build_mixamo_raw, converter_smoke_train,
                       tiny_train_args)


@pytest.fixture(scope='module')
def raw_root(tmp_path_factory):
    return build_mixamo_raw(str(tmp_path_factory.mktemp('mix_raw')))


def test_mixamo_convert_and_train(raw_root, smpl_tables_env, tmp_path,
                                  monkeypatch):
    from anerf_tpu.data.process_mixamo import process_mixamo_data

    out = process_mixamo_data(raw_root, subject='James', n_cam=2)
    with h5py.File(out, 'r') as f:
        n = f['imgs'].shape[0]
        assert n == 2 * 2 * 3                # 2 seqs x 2 cams x 3 frames
        # white-composited foregrounds: background pixels are 255
        imgs, masks = f['imgs'][:], f['masks'][:]
        assert (imgs[masks[..., 0] == 0] == 255).all()
        # global pose index: seq 2's frames offset past seq 1's poses
        kp_idxs = f['kp_idxs'][:]
        assert kp_idxs.max() == 5            # 2 seqs x 3 poses - 1
        assert set(np.unique(f['cam_idxs'][:])) == {0, 1}
        assert f['gt_poses'].shape == (6, 5, 3)

    # the selected-idx subset file the authors ship; converter emits an
    # all-frames default when absent
    sel = out.replace('processed_h5py.h5', 'selected.npy')
    assert os.path.exists(sel)
    assert (np.load(sel) == np.arange(12)).all()

    monkeypatch.chdir(raw_root)
    os.makedirs('data', exist_ok=True)
    if not os.path.exists('data/mixamo'):
        os.symlink(raw_root, 'data/mixamo')
    args = tiny_train_args(tmp_path, 'mixamo', 'james')
    ds, val = converter_smoke_train(args)
    # white background + temporal validity wired
    assert ds.has_bg and (ds.bgs == 255).all()
    assert ds.temp_validity[0] == 0
