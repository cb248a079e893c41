"""quality_ab per-cell resume: a killed sweep skips finished cells."""
import json
import os

import numpy as np
import pytest


@pytest.fixture
def stubbed_bench(tmp_path, monkeypatch):
    import bench
    import anerf_tpu.train.loop as loop

    calls = []

    def fake_train(args, ds, n_iters, **kw):
        calls.append(args.expname)
        return {'expname': args.expname}

    def fake_validation(ctx, steps, max_images=3):
        return {'psnr': 20.0 + len(calls), 'fg_psnr': 21.0, 'fg_ssim': 0.9}

    monkeypatch.setattr(loop, 'train', fake_train)
    monkeypatch.setattr(loop, 'run_validation', fake_validation)
    # keep fixture h5s inside tmp (quality_ab uses tempfile.gettempdir())
    import tempfile
    monkeypatch.setattr(tempfile, 'gettempdir', lambda: str(tmp_path))
    return bench, calls


def test_quality_ab_resumes_finished_cells(stubbed_bench, tmp_path, capsys):
    bench, calls = stubbed_bench
    state = str(tmp_path / 'state.jsonl')

    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0, 1],
                     cull_ratio=0.125, state_path=state)
    assert len(calls) == 4                     # 2 seeds x 2 configs
    assert len(open(state).read().splitlines()) == 4

    # second run: every cell already recorded -> zero training calls,
    # same final JSON verdict
    calls.clear()
    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0, 1],
                     cull_ratio=0.125, state_path=state)
    assert calls == []
    out = capsys.readouterr().out
    verdict = json.loads(out.strip().splitlines()[-1])
    assert verdict['metric'] == 'quality_ab_delta_psnr'
    assert len(verdict['rows']) == 4
    # per-variant summary carries spread, not just a point (VERDICT r3 #2)
    assert verdict['deltas']['culled'].keys() >= {'median', 'std', 'n'}
    assert verdict['deltas']['culled']['n'] == 2

    # a DIFFERENT protocol (deeper cull) must not reuse the state
    calls.clear()
    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.0625, state_path=state)
    assert len(calls) == 2


def test_quality_ab_partial_state_resumes_midway(stubbed_bench, tmp_path):
    bench, calls = stubbed_bench
    state = str(tmp_path / 'state.jsonl')

    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.125, state_path=state)
    assert len(calls) == 2

    # simulate a killed sweep: drop the last finished cell
    lines = open(state).read().splitlines()
    with open(state, 'w') as f:
        f.write(lines[0] + '\n')

    calls.clear()
    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.125, state_path=state)
    assert len(calls) == 1                     # only the dropped cell re-ran


def test_quality_ab_edited_variant_invalidates_state(stubbed_bench,
                                                     tmp_path, monkeypatch):
    """Editing an AB_VARIANTS definition must not silently reuse cells
    measured under the old definition (ADVICE r3)."""
    bench, calls = stubbed_bench
    state = str(tmp_path / 'state.jsonl')

    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.125, state_path=state,
                     variants=('control', 'fast'))
    assert len(calls) == 2

    calls.clear()
    monkeypatch.setitem(bench.AB_VARIANTS, 'fast',
                        lambda cull: dict(fast_grads=True, sr_grads=True))
    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.125, state_path=state,
                     variants=('control', 'fast'))
    assert calls == ['qab_blobs_0_fast']       # only the edited variant


def test_parse_style_resolution_suffix():
    import bench
    assert bench._parse_style('limbs') == ('limbs', 64)
    assert bench._parse_style('clutter') == ('clutter', 96)
    assert bench._parse_style('limbs@128') == ('limbs', 128)


def test_perturbed_fixture_helper(tmp_path):
    """The refine-cell fixture copy: GT stays, poses move, cyls follow."""
    import h5py

    import bench
    from anerf_tpu.data.fixtures import make_synthetic_h5

    src = str(tmp_path / 'src.h5')
    make_synthetic_h5(src, n_kps=2, n_cams=1, H=16, W=16)
    dst = str(tmp_path / 'pert.h5')
    gt_kp, init_mm = bench._ensure_perturbed_h5(src, dst, seed=0)

    with h5py.File(src) as fs, h5py.File(dst) as fd:
        np.testing.assert_array_equal(fd['gt_kp3d'][:], fs['gt_kp3d'][:])
        assert not np.allclose(fd['kp3d'][:], fs['kp3d'][:])
        assert not np.allclose(fd['skts'][:], fs['skts'][:])
        assert not np.allclose(fd['cyls'][:], fs['cyls'][:])
        np.testing.assert_array_equal(fd['imgs'][:], fs['imgs'][:])
    assert init_mm > 5.0        # 5 deg + 20 mm noise is tens of mm
    # deterministic per seed: re-running reuses the existing file
    gt2, init2 = bench._ensure_perturbed_h5(src, dst, seed=0)
    assert init2 == init_mm


def test_quality_ab_real_h5_style(stubbed_bench, tmp_path):
    """'h5:<path>' styles run the A/B on a REAL dataset h5 in place of a
    synthesized fixture (the real-scene hook, real_data_runbook.md §3)."""
    bench, calls = stubbed_bench
    real = tmp_path / 'scene' / 'real_train_h5py.h5'
    os.makedirs(real.parent)
    from anerf_tpu.data.fixtures import make_synthetic_h5
    make_synthetic_h5(str(real), n_kps=4, n_cams=2, H=32, W=32)

    state = str(tmp_path / 'state.jsonl')
    bench.quality_ab(steps=4, styles=[f'h5:{real}'], seeds=[0],
                     cull_ratio=0.125, state_path=state)
    assert len(calls) == 2
    rows = [json.loads(l) for l in open(state)]
    assert all(r['style'] == f'h5:{real}' for r in rows)

    with pytest.raises(FileNotFoundError):
        bench.quality_ab(steps=4, styles=['h5:/nonexistent.h5'], seeds=[0],
                         cull_ratio=0.125, state_path=state)
