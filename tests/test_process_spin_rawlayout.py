"""SPIN pack import dry-run: both pack formats the reference pipeline
reads (pickled dict / hdf5), the subject filter used by multi-subject
packs, and the derived quantities' invariants.

Pack contract per reference core/process_spin.py:14-42.
"""
import os

import numpy as np
import pytest

from rawlayout import make_spin_pack


@pytest.fixture(scope='module')
def packs(tmp_path_factory):
    d = tmp_path_factory.mktemp('spin_packs')
    rng = np.random.default_rng(21)
    paths = ([f'S1/Seq1/imageSequence/f_{i}.png' for i in range(4)]
             + [f'S2/Seq1/imageSequence/f_{i}.png' for i in range(3)])
    h5 = os.path.join(str(d), 'pack.h5')
    pkl = os.path.join(str(d), 'pack.pkl')
    data = make_spin_pack(h5, paths, rng, gt_pose3d=True)
    rng2 = np.random.default_rng(21)
    make_spin_pack(pkl, paths, rng2, gt_pose3d=True, as_pkl=True)
    return h5, pkl, data


def test_read_spin_data_h5_vs_pkl(packs, smpl_tables_env):
    from anerf_tpu.data.process_spin import read_spin_data
    h5, pkl, _ = packs
    a = read_spin_data(h5, img_res=64)
    b = read_spin_data(pkl, img_res=64)
    for k in ('kp3d', 'bones', 'skts', 'rest_pose', 'c2ws', 'focals',
              'cyls', 'gt_kp3d'):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
    # skts invert the FK transforms
    l2ws = np.linalg.inv(a['skts'])
    np.testing.assert_allclose(l2ws[..., :3, -1], a['kp3d'], atol=1e-4)
    # bone-length rescaling: mean bone length matches the canonical
    # rest pose scaled by ext_scale
    from anerf_tpu.data.process_spin import calculate_bone_length
    from anerf_tpu.skeleton import smpl_rest_pose
    ref = calculate_bone_length(
        smpl_rest_pose * 0.001 * (0.25 / 0.00035)).mean()
    got = calculate_bone_length(a['rest_pose']).mean()
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_read_spin_data_subject_filter(packs, smpl_tables_env):
    from anerf_tpu.data.process_spin import read_spin_data
    h5, _, data = packs
    out = read_spin_data(h5, img_res=64, subject_filter='S2')
    assert len(out['kp3d']) == 3
    assert all('S2' in (p.decode() if isinstance(p, bytes) else p)
               for p in out['img_path'])
    assert out['gt_kp3d'].shape == (3, 17, 3)
    np.testing.assert_allclose(out['gt_kp3d'],
                               np.asarray(data['pose_3d'])[4:], atol=1e-7)
