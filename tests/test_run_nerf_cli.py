"""run_nerf CLI: config-file-driven training end to end."""
import os

import numpy as np
import pytest

from anerf_tpu.config import load_config
from anerf_tpu.data.fixtures import make_synthetic_h5
from anerf_tpu.train.loop import train


def test_train_from_config_txt(tmp_path):
    h5 = str(tmp_path / 'syn_train_h5py.h5')
    make_synthetic_h5(h5, n_kps=4, n_cams=2, H=32, W=32)

    cfg_txt = tmp_path / 'exp.txt'
    cfg_txt.write_text(f"""
expname = cfg_exp
basedir = {tmp_path}
dataset_type = h5
subject = {h5}

bone_type = reldir
kp_dist_type = reldist
view_type = relray
use_cutoff = True
cutoff_viewdir = True
cutoff_inputs = True
use_viewdirs = True
use_background = True
opt_framecode = True

netdepth = 2
netwidth = 32
multires = 3
multires_views = 2
N_rand = 64
N_sample_images = 2
N_samples = 8
N_importance = 4
n_iters = 6
raw_noise_std = 1.0
chunk = 1024
compute_dtype = float32
scan_unroll = 3
i_print = 3
i_weights = 100000
i_testset = 100000
""")
    args = load_config(['--config', str(cfg_txt), '--seed', '1'])
    assert args.expname == 'cfg_exp'
    assert args.seed == 1
    ctx = train(args)
    assert int(ctx.state.step) == 6
    assert os.path.exists(os.path.join(ctx.exp_dir, 'args.txt'))
    assert os.path.exists(os.path.join(ctx.exp_dir, 'metrics.jsonl'))
