"""bench.py --n_devices covers BOTH the sharded train step and the
sharded render path and writes a machine-readable table (VERDICT r3 #6)."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


@pytest.mark.slow
def test_scaling_table_train_and_render(tmp_path, capsys):
    os.environ['_ANERF_SCALING_CPU'] = '1'   # already on the CPU mesh
    try:
        import bench
        out = tmp_path / 'scaling.json'
        bench.scaling_table(2, out_json=str(out))
    finally:
        os.environ.pop('_ANERF_SCALING_CPU', None)

    table = json.loads(out.read_text())
    assert table['platform'] == 'cpu-virtual'
    assert table['sizes'] == [1, 2]
    train = table['train']
    assert [r['devices'] for r in train] == [1, 2]
    assert all(r['rays_per_sec'] > 0 for r in train)
    assert train[0]['eff'] == 1.0
    assert all('total_vs_single' in r for r in train)
    # virtual-mesh render rows are core-capped: they must emit ONLY the
    # sharding-correctness signal, no perf-shaped fields a reader could
    # quote as TPU scaling data (VERDICT r4 weak #5)
    render = table['render']
    assert [r['devices'] for r in render] == [1, 2]
    for r in render:
        assert r['correctness_only'] is True
        assert r['total_vs_single'] > 0
        assert set(r) == {'devices', 'total_vs_single',
                          'correctness_only'}
    assert 'note' in table

    # the printed one-line JSON: train eff + render sharding signal
    last = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith('{')][-1]
    j = json.loads(last)
    assert j['metric'] == 'weak_scaling_eff'
    assert 'render_total_vs_single' in j
