"""Synthesizers for the AUTHORS' raw dataset layouts.

Each build_*_raw() writes the exact on-disk tree the reference's offline
pipelines consume (SPIN h5 packs per core/process_spin.py:14-42, the
Human3.6M pack trio per core/load_h36m.py:114-200, Mixamo render dumps per
core/load_mixamo.py:14-106, MonoPerfCap packs per core/load_perfcap.py:12-52,
the 3DHP MPI_SPIN pack per core/load_3dhp.py:82-141, and NeuralBody subject
dirs per core/load_zju.py:400-534) — tiny but structurally faithful, so the
data/process_*.py converters get a true import dry-run: raw tree ->
converter -> catalog dataset -> a few train steps -> validation render.

tools/real_data_runbook.md documents the same layouts for the day real
dumps land; keep the two in sync.
"""
import os
import pickle

import h5py
import numpy as np

H = W = 64


def write_img(path, rng, H=H, W=W, gray=False, person=True,
              mask_val=None):
    """A frame with a bright person-disc on a textured background; or a
    mask png when mask_val is given (person pixels = mask_val)."""
    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(path), exist_ok=True)
    yy, xx = np.mgrid[0:H, 0:W]
    disc = ((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 4) ** 2
    if mask_val is not None:
        img = (disc * mask_val).astype(np.uint8)
        if not gray:
            img = np.repeat(img[..., None], 3, -1)
    else:
        img = rng.integers(0, 80, (H, W, 3), np.uint8)
        img[disc] = rng.integers(150, 255, (int(disc.sum()), 3), np.uint8)
    imageio.imwrite(path, img)
    return img


def make_smpl_tables(tmp_dir):
    """Precomputed SMPL joint tables from the synthetic-but-valid model
    (shared with test_smpl_tables's LBS oracle)."""
    from test_smpl_tables import _synth_model

    from anerf_tpu.data import smpl_tables as st
    model, Jx = _synth_model()
    d = str(tmp_dir)
    pkl_path = os.path.join(d, 'SMPL_TEST.pkl')
    reg = os.path.join(d, 'J_regressor_h36m.npy')
    with open(pkl_path, 'wb') as f:
        pickle.dump(model, f)
    np.save(reg, Jx)
    return st.make_tables_from_smpl_pkl(
        pkl_path, os.path.join(d, 'tables.npz'), regressor_npy=reg)


def make_spin_pack(path, img_paths, rng, img_res=(H, W), gt_pose3d=False,
                   as_pkl=False):
    """A SPIN estimate pack with the keys the reference pipeline ships
    (pred_betas/pred_rot_mat/bbox_params/pred_camera/img_path; the
    authors' deepdish packs carry `pred_output` SMPL objects whose
    .joints column is flattened to `joints` here — see
    tools/real_data_runbook.md for the one-time flattening recipe)."""
    from scipy.spatial.transform import Rotation
    n = len(img_paths)
    rH, rW = img_res if not isinstance(img_res, int) else (img_res, img_res)
    data = {
        'pred_betas': rng.normal(0, 0.5, (n, 10)).astype(np.float32),
        'joints': (rng.normal(0, 0.2, (n, 24, 3)).astype(np.float32)
                   + np.array([0, 0, 2], np.float32)),
        'pred_rot_mat': Rotation.from_rotvec(
            rng.normal(0, 0.3, (n * 24, 3))).as_matrix().reshape(
                n, 24, 3, 3).astype(np.float32),
        'bbox_params': np.stack([
            np.full(n, rW / 2.), np.full(n, rH / 2.),
            rng.uniform(0.6, 0.9, n) * min(rH, rW)], -1).astype(np.float32),
        'pred_camera': np.stack([
            rng.uniform(0.8, 1.1, n), rng.normal(0, 0.05, n),
            rng.normal(0, 0.05, n)], -1).astype(np.float32),
        'img_path': np.asarray(img_paths, dtype='S'),
    }
    if gt_pose3d:
        data['pose_3d'] = rng.normal(0, 0.3, (n, 17, 3)).astype(np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if as_pkl:
        with open(path, 'wb') as f:
            pickle.dump({k: (np.array([p.decode() for p in v])
                             if k == 'img_path' else v)
                         for k, v in data.items()}, f)
    else:
        with h5py.File(path, 'w') as f:
            for k, v in data.items():
                f[k] = v
    return data


def build_h36m_raw(root, subject='S9'):
    """<root>: the reference's data/h36m tree — per-camera frame jpgs under
    <subject>/<seq>/imageSequence/<cam>/, the SPIN pack, the DeepLab mask
    pack (masks+index+res), and the clean/chair background stacks."""
    rng = np.random.default_rng(11)
    cams = ('54138969', '55011271', '58860488', '60457274')
    seqs = ('Directions-1', 'Walking-1')   # train + val ('Walking-')
    n_poses = 2
    img_paths = []
    for seq in seqs:
        for cam in cams:                   # cam-major: k % n_poses = pose
            for k in range(n_poses):
                p = f'{subject}/{seq}/imageSequence/{cam}/img_{k:06d}.jpg'
                write_img(os.path.join(root, p), rng)
                img_paths.append(p)
    n = len(img_paths)
    make_spin_pack(os.path.join(root, f'{subject}_SPIN_rect_output'
                                      '-maxmin.h5'), img_paths, rng)
    yy, xx = np.mgrid[0:H, 0:W]
    disc = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 4) ** 2)
    masks = np.repeat((disc * 2)[None, ..., None], n, 0).astype(
        np.uint8)                                    # labels {0,2}
    with h5py.File(os.path.join(root,
                                f'{subject}_mask_deeplab_crop.h5'), 'w') as f:
        f['masks'] = masks
        f['index'] = np.asarray(img_paths, 'S')
        f['res'] = 1.0
    name = subject.replace('s', '')
    bg = rng.integers(0, 80, (len(cams), H, W, 3), np.uint8)
    np.save(os.path.join(root, f'{name}_clean_bkgds.npy'), bg)
    np.save(os.path.join(root, f'{name}_chair_bkgds.npy'), bg)
    return root


def build_mixamo_raw(root, subject='James'):
    """<root>: data/mixamo — SPIN pack at <subject>/<subject>.h5, 4-camera
    renders <subject>/<seq>/Camera_<c>/Image%04d.png with RGB Masks/ and a
    per-sequence Camera_0/metadata.pickle carrying gt_pose dicts."""
    rng = np.random.default_rng(12)
    seqs = ('Jab', 'Kick')
    n_cam, n_frames = 2, 3
    joint_names = [f'mixamorig:J{k}' for k in range(5)]
    img_paths = []
    for seq in seqs:
        for cam in range(n_cam):
            for fr in range(1, n_frames + 1):
                p = f'{subject}/{seq}/Camera_{cam}/Image{fr:04d}.png'
                write_img(os.path.join(root, p), rng)
                write_img(os.path.join(
                    root, subject, seq, f'Camera_{cam}', 'Masks',
                    f'Image{fr:04d}.png'), rng, mask_val=2)
                img_paths.append(p)
        meta = {'gt_pose': [
            {j: rng.normal(0, 0.3, 3) for j in joint_names}
            for _ in range(n_frames)]}
        with open(os.path.join(root, subject, seq, 'Camera_0',
                               'metadata.pickle'), 'wb') as f:
            pickle.dump(meta, f)
    make_spin_pack(os.path.join(root, subject, f'{subject}.h5'),
                   img_paths, rng, img_res=1000)
    return root


def build_perfcap_raw(root, subject='Weipeng_outdoor'):
    """<root>: data tree with MonoPerfCap/MonoPerfCap-<subject>.h5 and
    images/ masks/ bkgd.png under MonoPerfCap/<subject>/."""
    rng = np.random.default_rng(13)
    img_paths = []
    for fr in range(6):
        p = f'MonoPerfCap/{subject}/images/frame_{fr:04d}.png'
        write_img(os.path.join(root, p), rng)
        write_img(os.path.join(root, f'MonoPerfCap/{subject}/masks/'
                                     f'frame_{fr:04d}.png'),
                  rng, mask_val=2, gray=True)
        img_paths.append(p)
    write_img(os.path.join(root, 'MonoPerfCap', subject, 'bkgd.png'), rng,
              person=False)
    make_spin_pack(os.path.join(root, 'MonoPerfCap',
                                f'MonoPerfCap-{subject}.h5'),
                   img_paths, rng, img_res=(H, W))
    return root


def build_3dhp_raw(root, subject='S1'):
    """<root>: data/mpi_3dhp — the multi-subject MPI_SPIN pack (img_path
    rows double as the subject filter), frames under
    <subject>/<seq>/imageSequence/, masks/ siblings, <subject>_bkgd.png."""
    rng = np.random.default_rng(14)
    img_paths = []
    for subj in (subject, 'S2'):          # second subject: filter must drop
        for fr in range(6):
            p = f'{subj}/Seq1/imageSequence/frame_{fr:06d}.png'
            write_img(os.path.join(root, p), rng)
            write_img(os.path.join(
                root, subj, 'Seq1', 'masks', f'frame_{fr:06d}.png'),
                rng, mask_val=2, gray=True)
            img_paths.append(p)
    write_img(os.path.join(root, f'{subject}_bkgd.png'), rng, person=False)
    make_spin_pack(os.path.join(root, 'MPI_SPIN_rect_output-maxmin.h5'),
                   img_paths, rng, img_res=(H, W), gt_pose3d=True)
    return root


def build_zju_raw(root, subject='377', num_cams=3, n_frames=3):
    """<root>/zju_mocap/CoreView_<subject>: annots.npy (cams K/D/R/T +
    per-frame ims), per-camera frame jpgs, mask/ + mask_cihp/ person masks,
    params/<frame>.npy EasyMocap SMPL params (shapes/poses/Rh/Th)."""
    rng = np.random.default_rng(15)
    sub = os.path.join(root, 'zju_mocap', f'CoreView_{subject}')
    K = np.array([[80., 0, W / 2], [0, 80., H / 2], [0, 0, 1]])
    cams = {'K': [], 'D': [], 'R': [], 'T': []}
    from scipy.spatial.transform import Rotation
    for c in range(num_cams):
        cams['K'].append(K.copy())
        cams['D'].append(np.zeros((5, 1)))
        cams['R'].append(Rotation.from_rotvec(
            [0, 0.3 * c, 0]).as_matrix())
        cams['T'].append(np.array([[0.], [0.], [2000.]]))  # mm
    ims = []
    os.makedirs(os.path.join(sub, 'params'), exist_ok=True)
    for fr in range(n_frames):
        frame_ims = []
        for c in range(num_cams):
            p = f'Camera_B{c + 1}/{fr:06d}.jpg'
            write_img(os.path.join(sub, p), rng)
            write_img(os.path.join(sub, 'mask' if c % 2 == 0 else
                                   'mask_cihp', p[:-4] + '.png'),
                      rng, mask_val=255, gray=True)
            frame_ims.append(p)
        ims.append({'ims': frame_ims})
        np.save(os.path.join(sub, 'params', f'{fr}.npy'),
                {'shapes': rng.normal(0, 0.5, (1, 10)),
                 'poses': rng.normal(0, 0.2, (1, 72)),
                 'Rh': rng.normal(0, 0.3, (1, 3)),
                 'Th': rng.normal(0, 0.5, (1, 3))},
                allow_pickle=True)
    np.save(os.path.join(sub, 'annots.npy'),
            {'cams': cams, 'ims': ims}, allow_pickle=True)
    return root


def tiny_train_args(tmp_path, dataset_type, subject, **overrides):
    """A minimal TrainConfig for converter-output smoke training."""
    from anerf_tpu.config import TrainConfig
    defaults = dict(
        expname=f'raw_{dataset_type}', basedir=str(tmp_path / 'logs'),
        dataset_type=(dataset_type,), subject=(subject,),
        netdepth=2, netwidth=32, netwidth_fine=32, multires=4,
        multires_views=2, N_samples=12, N_importance=4, N_rand=128,
        N_sample_images=4, use_viewdirs=True, use_cutoff=True,
        cutoff_viewdir=True, cutoff_inputs=True, use_background=True,
        opt_framecode=True, ext_scale=0.001, lrate=5e-4, raw_noise_std=1.0,
        i_print=10**6, i_weights=10**8, i_testset=10**8,
        i_pose_weights=10**8, chunk=1024, compute_dtype='float32',
        num_workers=0,
    )
    defaults.update(overrides)
    return TrainConfig(**defaults)


def converter_smoke_train(args, n_iters=3):
    """Catalog-construct the dataset the converter just wrote, train a few
    steps, render one validation image; returns (ctx, val metrics)."""
    import numpy as np

    from anerf_tpu.data.catalog import get_dataset_from_catalog
    from anerf_tpu.train.loop import run_validation, train

    ds = get_dataset_from_catalog(
        args, args.N_rand // args.N_sample_images,
        args.dataset_type[0], args.subject[0])
    ctx = train(args, ds, n_iters=n_iters)
    val = run_validation(ctx, n_iters, max_images=1)
    assert np.isfinite(val['psnr']), val
    return ds, val
