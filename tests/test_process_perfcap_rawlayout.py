"""MonoPerfCap import dry-run: the authors' pack (MonoPerfCap-<subject>.h5
SPIN estimates + images/ masks/ bkgd.png) -> process_perfcap_data ->
catalog MonoPerfCapDataset (tail-n val split, 1.05 camera scale fix) ->
train -> validation render.

Raw layout per reference core/load_perfcap.py:12-52.
"""
import os

import h5py
import numpy as np
import pytest

from rawlayout import (build_perfcap_raw, converter_smoke_train,
                       tiny_train_args)


@pytest.fixture(scope='module')
def raw_root(tmp_path_factory):
    return build_perfcap_raw(str(tmp_path_factory.mktemp('pc_raw')))


def test_perfcap_convert_and_train(raw_root, smpl_tables_env, tmp_path,
                                   monkeypatch):
    from anerf_tpu.data.process_perfcap import process_perfcap_data

    out = process_perfcap_data(raw_root, subject='Weipeng_outdoor',
                               img_res=(64, 64))
    assert out.endswith('Weipeng_outdoor_processed_h5py.h5')
    with h5py.File(out, 'r') as f:
        n = f['imgs'].shape[0]
        assert n == 6
        assert (f['masks'][:].max() == 1)    # label {0,2} -> binary
        assert f['bkgds'].shape[0] == 1      # single static plate
        assert (f['bkgd_idxs'][:] == 0).all()
        assert (f['kp_idxs'][:] == np.arange(6)).all()
        c2ws_raw = f['c2ws'][:]

    monkeypatch.chdir(raw_root)
    os.makedirs('data', exist_ok=True)
    if not os.path.exists('data/MonoPerfCap'):
        os.symlink(os.path.join(raw_root, 'MonoPerfCap'), 'data/MonoPerfCap')
    args = tiny_train_args(tmp_path, 'perfcap', 'weipeng')
    ds, val = converter_smoke_train(args)
    # the 1.05 SPIN camera-scale fix applied at load time
    np.testing.assert_allclose(ds.c2ws[..., :3, -1],
                               c2ws_raw[..., :3, -1] / 1.05, rtol=1e-6)
    assert ds.temp_validity[0] == 0
