"""Config system: reference config txts parse; snapshots round-trip."""
import os

import numpy as np
import pytest

from anerf_tpu.config import (TrainConfig, load_args_txt, load_config,
                              save_args_txt)

REF_CONFIGS = '/root/reference/configs'


def test_defaults_match_reference_parser():
    c = TrainConfig()
    # spot-check the reference argparse defaults (run_nerf.py:184-488)
    assert c.N_rand == 32 * 32 * 4
    assert c.lrate == 5e-4
    assert c.lrate_decay == 250
    assert c.decay_unit == 1000
    assert c.multires == 10
    assert c.multires_views == 4
    assert c.cutoff_mm == 500
    assert c.cutoff_step == 250
    assert c.cutoff_rate == 10.0
    assert c.opt_pose_step == 1
    assert c.i_testset == 50000


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS),
                    reason='reference configs not mounted')
@pytest.mark.parametrize('rel', [
    'surreal/surreal.txt', 'surreal/surreal_single.txt',
    'mixamo/mixamo.txt', 'mixamo/mixamo_finetune.txt',
    'h36m/h36m_prot2.txt', 'perfcap/perfcap.txt',
])
def test_reference_configs_parse(rel):
    path = os.path.join(REF_CONFIGS, rel)
    if not os.path.exists(path):
        pytest.skip(f'{rel} not present')
    cfg = load_config(['--config', path])
    assert cfg.N_rand > 0
    assert cfg.n_iters > 0
    if 'surreal' in rel:
        assert cfg.dataset_type == ('surreal',)
        assert cfg.use_cutoff and cfg.cutoff_inputs and cfg.use_viewdirs
        assert cfg.N_samples in (64, 96)
    if rel == 'mixamo/mixamo.txt':
        assert cfg.opt_pose and cfg.opt_rot6d
        assert cfg.opt_pose_step == 20
        assert cfg.loss_fn == 'L1'
        assert cfg.lrate_decay == 500000 and cfg.decay_unit == 1


def test_cli_overrides_and_bool_flags():
    cfg = load_config(['--N_rand', '1024', '--use_cutoff',
                       '--dataset_type', 'surreal', 'h36m',
                       '--subject', 'female', 'S9',
                       '--opt_pose_stop', '5000'])
    assert cfg.N_rand == 1024
    assert cfg.use_cutoff is True
    assert cfg.dataset_type == ('surreal', 'h36m')
    assert cfg.subject == ('female', 'S9')
    assert cfg.opt_pose_stop == 5000


def test_args_txt_roundtrip(tmp_path):
    cfg = TrainConfig(expname='rt', N_rand=77, use_cutoff=True,
                      dataset_type=('surreal',), subject=('female',),
                      opt_pose_stop=None, weight_decay=None,
                      lrate=1.5e-4)
    save_args_txt(cfg, str(tmp_path))
    cfg2 = load_args_txt(os.path.join(str(tmp_path), 'args.txt'))
    assert cfg2.N_rand == 77
    assert cfg2.use_cutoff is True
    assert cfg2.opt_pose_stop is None
    assert cfg2.dataset_type == ('surreal',)
    assert np.isclose(cfg2.lrate, 1.5e-4)


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / 'bad.txt'
    p.write_text('not_a_flag = 1\n')
    with pytest.raises(KeyError):
        load_config(['--config', str(p)])


def test_lr_decay_schedule_matches_reference():
    """lr = lrate * rate^((count // unit) / decay)
    (reference decay_optimizer_lrate, trainer.py:173-183)."""
    from anerf_tpu.train.state import decay_schedule
    # surreal recipe: decay 500, unit 1000, rate 0.1
    s = decay_schedule(5e-4, 500, 0.1, 1000)
    assert np.isclose(float(s(0)), 5e-4)
    assert np.isclose(float(s(999)), 5e-4)           # within first unit
    assert np.isclose(float(s(1000)), 5e-4 * 0.1 ** (1 / 500))
    assert np.isclose(float(s(250000)), 5e-4 * 0.1 ** 0.5)
    # mixamo recipe: decay 500000, unit 1 -> continuous decay by step
    s2 = decay_schedule(5e-4, 500000, 0.1, 1)
    assert np.isclose(float(s2(250000)), 5e-4 * 0.1 ** 0.5)


REF_RUN_NERF = '/root/reference/run_nerf.py'


@pytest.mark.skipif(not os.path.isfile(REF_RUN_NERF),
                    reason='reference not mounted')
def test_flag_surface_covers_reference():
    """Every flag the reference parser defines (run_nerf.py:184-488) is a
    TrainConfig field — live ones wired, dead ones annotated — so any
    reference args.txt/config.txt loads without edits. Regex-parsed from
    the reference source because configargparse isn't installed here."""
    import dataclasses
    import re

    src = open(REF_RUN_NERF).read()
    flags = re.findall(r"add_argument\(\s*['\"]--([A-Za-z0-9_]+)['\"]", src)
    assert len(flags) > 120            # the parser really was found
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    missing = sorted(set(flags) - fields)
    assert not missing, f'reference flags without a config field: {missing}'
