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
                     cull_ratio=0.125, fast_grads=True, state_path=state)
    assert len(calls) == 4                     # 2 seeds x 2 configs
    assert len(open(state).read().splitlines()) == 4

    # second run: every cell already recorded -> zero training calls,
    # same final JSON verdict
    calls.clear()
    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0, 1],
                     cull_ratio=0.125, fast_grads=True, state_path=state)
    assert calls == []
    out = capsys.readouterr().out
    verdict = json.loads(out.strip().splitlines()[-1])
    assert verdict['metric'] == 'quality_ab_delta_psnr'
    assert len(verdict['rows']) == 4

    # a DIFFERENT protocol (deeper cull) must not reuse the state
    calls.clear()
    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.0625, fast_grads=True, state_path=state)
    assert len(calls) == 2


def test_quality_ab_partial_state_resumes_midway(stubbed_bench, tmp_path):
    bench, calls = stubbed_bench
    state = str(tmp_path / 'state.jsonl')

    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.125, fast_grads=True, state_path=state)
    assert len(calls) == 2

    # simulate a killed sweep: drop the last finished cell
    lines = open(state).read().splitlines()
    with open(state, 'w') as f:
        f.write(lines[0] + '\n')

    calls.clear()
    bench.quality_ab(steps=4, styles=['blobs'], seeds=[0],
                     cull_ratio=0.125, fast_grads=True, state_path=state)
    assert len(calls) == 1                     # only the dropped cell re-ran
