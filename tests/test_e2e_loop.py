"""Minimum end-to-end slice: synthetic h5 -> training loop -> val render."""
import os

import numpy as np
import pytest

from anerf_tpu.config import TrainConfig, load_args_txt
from anerf_tpu.data.fixtures import make_synthetic_h5
from anerf_tpu.data.surreal import SurrealDataset
from anerf_tpu.train.loop import run_validation, setup, train


@pytest.fixture(scope='module')
def h5_path(tmp_path_factory):
    p = tmp_path_factory.mktemp('data') / 'e2e_train_h5py.h5'
    make_synthetic_h5(str(p), n_kps=6, n_cams=3, H=48, W=48)
    return str(p)


def e2e_args(tmp_path, h5_path, **overrides):
    defaults = dict(
        expname='e2e', basedir=str(tmp_path),
        dataset_type=('h5',), subject=(h5_path,),
        netdepth=4, netwidth=64, multires=5, multires_views=2,
        N_samples=24, N_importance=8, N_rand=256, N_sample_images=4,
        use_viewdirs=True, use_cutoff=True, cutoff_viewdir=True,
        cutoff_inputs=True, use_background=True, opt_framecode=True,
        # raw_noise_std matters: without it the ReLU density can start
        # dead (constant negative sigma -> zero gradient); the reference
        # recipe uses 1.0 for the same reason
        ext_scale=0.001, lrate=5e-4, raw_noise_std=1.0,
        i_print=50, i_weights=10**8, i_testset=10**8, i_pose_weights=10**8,
        chunk=2048, compute_dtype='float32', num_workers=0,
    )
    defaults.update(overrides)
    return TrainConfig(**defaults)


def test_e2e_training_improves_psnr(tmp_path, h5_path):
    args = e2e_args(tmp_path, h5_path)
    ds = SurrealDataset(h5_path, N_samples=args.N_rand // args.N_sample_images,
                        split='train')

    ctx = setup(args, ds)
    val0 = run_validation(ctx, 0, max_images=2)

    ctx = train(args, ds, n_iters=150)
    val1 = run_validation(ctx, 150, max_images=2)

    assert np.isfinite(val1['psnr'])
    assert val1['psnr'] > val0['psnr'] + 1.0, (val0, val1)
    # args.txt snapshot written and re-parsable
    snap = os.path.join(ctx.exp_dir, 'args.txt')
    assert os.path.exists(snap)
    args2 = load_args_txt(snap)
    assert args2.N_rand == args.N_rand
    assert args2.dataset_type == args.dataset_type


def test_checkpoint_resume(tmp_path, h5_path):
    # scan_unroll=1: exact per-step checkpoint semantics
    args = e2e_args(tmp_path, h5_path, expname='resume', i_weights=20,
                    scan_unroll=1)
    ds = SurrealDataset(h5_path, N_samples=args.N_rand // args.N_sample_images,
                        split='train')
    ctx = train(args, ds, n_iters=20)
    p0 = np.asarray(ctx.state.params['coarse']['pts_linears'][0]['w']).copy()

    ctx2 = setup(args, ds)
    assert ctx2.start_step == 20
    p1 = np.asarray(ctx2.state.params['coarse']['pts_linears'][0]['w'])
    np.testing.assert_array_equal(p0, p1)

    # finetune mode resets the step but keeps weights
    args_ft = e2e_args(tmp_path, h5_path, expname='resume', i_weights=20,
                       scan_unroll=1, finetune=True)
    ctx3 = setup(args_ft, ds)
    assert ctx3.start_step == 0
    np.testing.assert_array_equal(
        np.asarray(ctx3.state.params['coarse']['pts_linears'][0]['w']), p0)


def test_restore_from_path_variants(tmp_path, h5_path):
    """--ft_path restore from an expdir / checkpoints dir / step dir:
    weights merge into a fresh state, optimizer state stays untouched
    (ft_path semantics are weights-only; reference raycasters.py:125-126)."""
    from anerf_tpu.train.checkpoint import restore_from_path

    args = e2e_args(tmp_path, h5_path, expname='ftsrc', i_weights=4,
                    scan_unroll=1)
    ds = SurrealDataset(h5_path, N_samples=args.N_rand // args.N_sample_images,
                        split='train')
    ctx = train(args, ds, n_iters=4)
    w_src = np.asarray(
        ctx.state.params['coarse']['pts_linears'][0]['w']).copy()

    exp_dir = ctx.exp_dir
    ckpt_dir = os.path.join(exp_dir, 'checkpoints')
    step_dir = os.path.join(ckpt_dir, '4')
    assert os.path.isdir(step_dir)

    args2 = e2e_args(tmp_path, h5_path, expname='fttgt', no_reload=True)
    ctx2 = setup(args2, ds)
    for path in (exp_dir, ckpt_dir, step_dir):
        restored = restore_from_path(path, ctx2.state)
        assert int(restored.step) == 4, path
        np.testing.assert_array_equal(
            np.asarray(restored.params['coarse']['pts_linears'][0]['w']),
            w_src)
        assert restored.opt_state is ctx2.state.opt_state

    # full wiring: setup(--ft_path --finetune) loads weights, resets step
    args3 = e2e_args(tmp_path, h5_path, expname='ftwire', ft_path=step_dir,
                     finetune=True)
    ctx3 = setup(args3, ds)
    assert ctx3.start_step == 0
    np.testing.assert_array_equal(
        np.asarray(ctx3.state.params['coarse']['pts_linears'][0]['w']),
        w_src)


def test_multi_subject_training(tmp_path, h5_path):
    """ConcatH5Dataset -> training with per-subject rest poses + pose-opt."""
    from anerf_tpu.data.dataset import ConcatH5Dataset

    h5_b = str(tmp_path / 'second_train_h5py.h5')
    make_synthetic_h5(h5_b, n_kps=4, n_cams=2, H=48, W=48, seed=5)
    args = e2e_args(tmp_path, h5_path, expname='multi', opt_pose=True,
                    opt_rot6d=True, opt_pose_step=2, opt_pose_coef=0.5,
                    scan_unroll=2)
    d1 = SurrealDataset(h5_path, N_samples=args.N_rand // args.N_sample_images,
                        split='train')
    d2 = SurrealDataset(h5_b, N_samples=args.N_rand // args.N_sample_images,
                        split='train')
    cat = ConcatH5Dataset([d1, d2])
    meta = cat.get_meta()
    assert meta['rest_pose'].shape[0] == 2
    assert meta['rest_pose_idxs'].max() == 1

    ctx = train(args, cat, n_iters=6)
    assert int(ctx.state.step) == 6
    # pose params cover both subjects' frames
    assert ctx.state.pose_params['pelvis'].shape[0] == len(meta['kp3d'])
