"""run_render CLI integration: train tiny -> render bullet + mesh modes."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from anerf_tpu.config import TrainConfig
from anerf_tpu.data.fixtures import make_synthetic_h5
from anerf_tpu.data.surreal import SurrealDataset
from anerf_tpu.train.loop import train


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('render_cli')
    h5 = str(tmp / 'syn_train_h5py.h5')
    make_synthetic_h5(h5, n_kps=4, n_cams=2, H=32, W=32)
    args = TrainConfig(
        expname='cli', basedir=str(tmp), dataset_type=('h5',), subject=(h5,),
        netdepth=2, netwidth=32, multires=3, multires_views=2,
        N_samples=8, N_importance=4, N_rand=64, N_sample_images=2,
        use_viewdirs=True, use_cutoff=True, cutoff_viewdir=True,
        cutoff_inputs=True, use_background=True, opt_framecode=True,
        ext_scale=0.001, raw_noise_std=1.0, chunk=1024,
        compute_dtype='float32', i_weights=8, i_testset=10**8,
        i_print=10**8, scan_unroll=4, n_iters=8)
    ds = SurrealDataset(h5, N_samples=32, split='train')
    ctx = train(args, ds, n_iters=8)
    return tmp, h5, ctx


def _render_args(tmp, **over):
    import run_render
    base = dict(nerf_args=os.path.join(str(tmp), 'cli', 'args.txt'),
                ckptpath=os.path.join(str(tmp), 'cli', 'checkpoints'),
                render_res=None, dataset='surreal', entry='female',
                white_bkgd=True, render_type='bullet', save_gt=False,
                fps=4, mesh_res=24, mesh_thres=5.0, mesh_overlay=False,
                render_refined=False,
                subject_idx=0, selected_idxs=[0], selected_framecode=None,
                outputdir=os.path.join(str(tmp), 'render_out'),
                runname='t', eval=False, no_save=False)
    base.update(over)
    import argparse
    return argparse.Namespace(**base)


def _patch_catalog(monkeypatch, h5):
    import anerf_tpu.render.catalog as cat
    orig = cat.init_catalog

    def fake(n_bullet=10):
        c = orig(n_bullet)
        c['surreal']['female']['data_h5'] = h5
        for mode in ('bullet', 'interpolate'):
            c['surreal']['female'][mode]['selected_idxs'] = np.array([0, 1])
        c['surreal']['female']['bullet']['n_bullet'] = 3
        c['surreal']['female']['mesh'] = {'selected_idxs': np.array([0])}
        return c
    monkeypatch.setattr(cat, 'init_catalog', fake)
    import run_render as rr
    return rr


def test_render_bullet_cli(trained, monkeypatch):
    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='bullet', selected_idxs=None)
    out = rr.run_render(args)
    assert out['rgbs'].shape[0] == 6  # 2 idxs x 3 bullet views
    assert np.isfinite(out['rgbs']).all()
    img_dir = os.path.join(str(tmp), 'render_out', 'surreal', 't', 'image')
    assert len(os.listdir(img_dir)) == 6


def test_render_mesh_cli(trained, monkeypatch):
    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='mesh', runname='m')
    rr.run_render(args)
    mesh_dir = os.path.join(str(tmp), 'render_out', 'surreal', 'm', 'meshes')
    plys = os.listdir(mesh_dir)
    assert len(plys) == 1
    from anerf_tpu.utils.marching import load_ply
    verts, faces = load_ply(os.path.join(mesh_dir, plys[0]))
    # density field of a near-untrained net may or may not cross threshold;
    # the pipeline must produce a valid (possibly empty) mesh
    assert verts.shape[1] == 3 and faces.shape[1] == 3


def test_render_mesh_overlay_cli(trained, monkeypatch):
    """--mesh_overlay writes a normal-shaded mesh composite over the GT
    frame (the SMPL-overlay debug substitute)."""
    import imageio

    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='mesh', runname='mo',
                        mesh_thres=0.0, mesh_overlay=True)
    rr.run_render(args)
    mesh_dir = os.path.join(str(tmp), 'render_out', 'surreal', 'mo',
                            'meshes')
    files = os.listdir(mesh_dir)
    overlays = [f for f in files if f.startswith('overlay_')]
    assert len(overlays) == 1, files
    img = imageio.imread(os.path.join(mesh_dir, overlays[0]))
    assert img.shape == (32, 32, 3)


def test_run_validation_saves_images(trained):
    tmp, h5, ctx = trained
    from anerf_tpu.train.loop import run_validation
    val = run_validation(ctx, 99, max_images=2, save_images=True)
    assert np.isfinite(val['psnr'])
    val_dir = os.path.join(ctx.exp_dir, 'val', f'{99:08d}')
    files = os.listdir(val_dir)
    assert any(f.startswith('rgb_') for f in files)
    assert any(f.startswith('skel_') for f in files)
    assert any(f.startswith('disp_') for f in files)


def test_render_res_scales_focal_and_eval(trained, monkeypatch):
    """--render_res: intrinsics scale with the resolution — the projected
    body bbox doubles at 2x res — and --eval resizes the native-res GT to
    the render resolution (regression: focals were left unscaled and the
    GT reshape crashed at non-native res). Mirrors reference
    run_render.py:166-172."""
    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args_n = _render_args(tmp, render_type='val', runname='rn',
                          selected_idxs=[0, 1], eval=True)
    out_n = rr.run_render(args_n)
    args_2 = _render_args(tmp, render_type='val', runname='r2',
                          selected_idxs=[0, 1], eval=True,
                          render_res=[64, 64])
    out_2 = rr.run_render(args_2)
    assert out_2['rgbs'].shape[1:3] == (64, 64)
    # eval wrote metrics at both resolutions (GT resize path exercised)
    for run in ('rn', 'r2'):
        mfile = os.path.join(str(tmp), 'render_out', 'surreal', run,
                             'metrics.txt')
        assert os.path.exists(mfile)
    # reprojection geometry: with scaled intrinsics the projected box is
    # ~2x in each dimension; unscaled focals would leave it ~1x
    (tl_n, br_n) = out_n['bboxes'][0]
    (tl_2, br_2) = out_2['bboxes'][0]
    for d in range(2):
        ratio = (br_2[d] - tl_2[d]) / max(br_n[d] - tl_n[d], 1)
        assert 1.5 < ratio <= 2.5, (d, ratio, out_n['bboxes'][0],
                                    out_2['bboxes'][0])


def test_eval_rejects_non_1to1_modes(trained, monkeypatch):
    """--eval on bullet (n_views renders per GT pose) must refuse instead
    of misaligning GT frames."""
    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='bullet', selected_idxs=None,
                        runname='be', eval=True, no_save=True)
    with pytest.raises(ValueError, match='--eval'):
        rr.run_render(args)


def test_eval_unsorted_selected_idxs(tmp_path):
    """GT frames must follow the render (selection) order, not sorted order
    (regression: evaluate() used np.sort on the h5 read, misaligning
    GT with renders for any unsorted selected_idxs)."""
    import h5py
    import run_render

    H = W = 16
    n = 4
    imgs = np.stack([np.full((H * W, 3), i * 40, np.uint8)
                     for i in range(n)])
    masks = np.ones((n, H * W, 1), np.uint8)
    h5 = str(tmp_path / 'eval.h5')
    with h5py.File(h5, 'w') as f:
        f.create_dataset('imgs', data=imgs)
        f.create_dataset('masks', data=masks)

    sel = np.array([2, 0, 1])
    out = {'rgbs': imgs[sel].reshape(-1, H, W, 3).astype(np.float32) / 255.,
           'bboxes': None}
    import argparse
    args = argparse.Namespace(eval=True)
    metrics = run_render.evaluate(
        args, out, h5, {'selected_idxs': sel}, str(tmp_path), H, W)
    # renders are bit-identical to correctly ordered GT -> psnr is infinite
    assert metrics['psnr'] > 60.0


def test_render_server_mode(trained, monkeypatch):
    """--server: one loaded model serves multiple JSON requests — val with
    eval, a rejected malformed request (server must survive it), a bullet
    render, then a clean quit."""
    import io
    import json

    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='val', runname='srv0')
    requests = [
        {'render_type': 'val', 'selected_idxs': [0, 1], 'runname': 'srv1',
         'eval': True},
        {'render_type': 'val', 'bogus_field': 1},
        {'render_type': 'bullet', 'selected_idxs': None, 'runname': 'srv2'},
        {'cmd': 'quit'},
    ]
    stdin = io.StringIO('\n'.join(json.dumps(r) for r in requests) + '\n')
    stdout = io.StringIO()
    rr.serve(args, stdin=stdin, stdout=stdout)
    lines = [json.loads(ln) for ln in stdout.getvalue().splitlines()]
    assert len(lines) == 5, stdout.getvalue()
    ready, r1, r2, r3, bye = lines
    assert ready['ok'] and ready['ready'] and ready['load_seconds'] > 0
    assert r1['ok'] and r1['n_frames'] == 2 and 'psnr' in r1['eval']
    assert not r2['ok'] and 'bogus_field' in r2['error']
    assert r3['ok'] and r3['n_frames'] == 6     # 2 idxs x 3 bullet views
    assert bye['ok'] and bye.get('bye')
    img_dir = os.path.join(str(tmp), 'render_out', 'surreal', 'srv2',
                           'image')
    assert len(os.listdir(img_dir)) == 6


def test_render_server_batches_queued_requests(trained, monkeypatch):
    """With --coalesce, requests queued together share ONE render_path
    dispatch (same resolution), and the batched outputs are bit-identical
    to the same requests served one at a time."""
    import io
    import json

    import run_render as rr_mod

    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='val', runname='srvb0',
                        coalesce=True)

    calls = []
    orig_rp = None
    from anerf_tpu.render import render_path as rp_mod
    orig_rp = rp_mod.render_path

    def spy(params, cfg, c2ws, *a, **kw):
        calls.append(len(c2ws))
        return orig_rp(params, cfg, c2ws, *a, **kw)

    monkeypatch.setattr(rp_mod, 'render_path', spy)

    reqs = [
        {'render_type': 'val', 'selected_idxs': [0], 'runname': 'srvb1'},
        {'render_type': 'val', 'selected_idxs': [1], 'runname': 'srvb2'},
        {'cmd': 'quit'},
    ]
    stdin = io.StringIO('\n'.join(json.dumps(r) for r in reqs) + '\n')
    stdout = io.StringIO()
    rr.serve(args, stdin=stdin, stdout=stdout)
    lines = [json.loads(ln) for ln in stdout.getvalue().splitlines()]
    ready, r1, r2, bye = lines
    assert r1['ok'] and r2['ok'] and bye.get('bye')
    # both requests rode one coalesced 2-pose dispatch
    assert r1.get('batched') == 2 and r2.get('batched') == 2
    assert calls == [2], calls

    # bit-identical to serving each request alone
    calls.clear()
    stdin = io.StringIO(json.dumps(reqs[0] | {'runname': 'srvs1'}) + '\n'
                        + json.dumps({'cmd': 'quit'}) + '\n')
    rr.serve(args, stdin=stdin, stdout=io.StringIO())
    assert calls == [1], calls
    import imageio
    a = imageio.imread(os.path.join(str(tmp), 'render_out', 'surreal',
                                    'srvb1', 'image', '00000.png'))
    b = imageio.imread(os.path.join(str(tmp), 'render_out', 'surreal',
                                    'srvs1', 'image', '00000.png'))
    np.testing.assert_array_equal(a, b)


def test_render_server_default_per_request_dispatch(trained, monkeypatch):
    """Without --coalesce (the default), queued requests each get their
    own shape-stable dispatch and replies carry no 'batched' field —
    variable coalesced group sizes recompile under concurrent clients
    (PERF.md round 5)."""
    import io
    import json

    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='val', runname='srvnc0')

    calls = []
    from anerf_tpu.render import render_path as rp_mod
    orig_rp = rp_mod.render_path

    def spy(params, cfg, c2ws, *a, **kw):
        calls.append(len(c2ws))
        return orig_rp(params, cfg, c2ws, *a, **kw)

    monkeypatch.setattr(rp_mod, 'render_path', spy)

    reqs = [
        {'render_type': 'val', 'selected_idxs': [0], 'runname': 'srvnc1'},
        {'render_type': 'val', 'selected_idxs': [1], 'runname': 'srvnc2'},
        {'cmd': 'quit'},
    ]
    stdin = io.StringIO('\n'.join(json.dumps(r) for r in reqs) + '\n')
    stdout = io.StringIO()
    rr.serve(args, stdin=stdin, stdout=stdout)
    lines = [json.loads(ln) for ln in stdout.getvalue().splitlines()]
    ready, r1, r2, bye = lines
    assert r1['ok'] and r2['ok'] and bye.get('bye')
    assert 'batched' not in r1 and 'batched' not in r2
    assert calls == [1, 1], calls


def test_render_server_eof_shuts_down(trained, monkeypatch):
    """EOF on stdin (client gone) must end serve() cleanly after ready."""
    import io
    import json

    tmp, h5, ctx = trained
    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp)
    stdout = io.StringIO()
    rr.serve(args, stdin=io.StringIO(''), stdout=stdout)
    lines = [json.loads(ln) for ln in stdout.getvalue().splitlines()]
    assert len(lines) == 1 and lines[0]['ready']


def test_render_from_reference_tar(trained, monkeypatch, tmp_path):
    """Export the trained model as a reference .tar and render through the
    run_render tar branch."""
    tmp, h5, ctx = trained
    from anerf_tpu.pose.ckpt_compat import export_reference_checkpoint
    import jax.numpy as jnp

    tar = str(tmp_path / 'model.tar')
    export_reference_checkpoint(
        tar, ctx.state.params, global_step=8, tau=20.0,
        pose_params={'pelvis': ctx.data_attrs['kp3d'][:, 0],
                     'bones': ctx.data_attrs['bones']},
        rest_pose=ctx.data_attrs['rest_pose'])

    rr = _patch_catalog(monkeypatch, h5)
    args = _render_args(tmp, render_type='bullet', selected_idxs=None,
                        runname='tar', ckptpath=tar)
    out = rr.run_render(args)
    assert out['rgbs'].shape[0] == 6
    assert np.isfinite(out['rgbs']).all()


def test_config_file_expansion(tmp_path):
    """--config txt (reference run_render.py:29 configargparse format)
    expands into argv with CLI flags overriding file values."""
    import run_render as rr
    cfg = tmp_path / 'render.txt'
    cfg.write_text(
        'nerf_args = /x/args.txt\n'
        'ckptpath = /x/ckpt\n'
        'dataset = surreal\n'
        'entry = female\n'
        'runname = fromfile\n'
        'render_type = bullet\n'
        'white_bkgd = True\n'
        'eval = False\n'
        'selected_idxs = 0 2 5\n'
        '# comment line\n')
    tokens = rr._argv_from_config(str(cfg))
    args = rr.config_parser().parse_args(
        tokens + ['--runname', 'cli_wins'])
    assert args.nerf_args == '/x/args.txt'
    assert args.dataset == 'surreal'
    assert args.white_bkgd is True
    assert args.eval is False            # false bool never becomes a flag
    assert args.selected_idxs == [0, 2, 5]
    assert args.runname == 'cli_wins'    # CLI overrides the file


def test_render_mesh_reference_flags(tmp_path, monkeypatch):
    """render_mesh.py with the REFERENCE flag surface (-ww/-hh,
    --basedir/--expname derive mesh + output dirs, --skip)."""
    import sys

    from anerf_tpu.utils.marching import save_ply

    mesh_dir = tmp_path / 'render_output' / 'm1' / 'meshes'
    mesh_dir.mkdir(parents=True)
    # one tetrahedron per "pose"
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    for i in range(3):
        save_ply(str(mesh_dir / f'{i:03d}.ply'), verts + 0.1 * i, faces)

    import render_mesh
    monkeypatch.setattr(sys, 'argv', [
        'render_mesh.py', '-ww', '48', '-hh', '32', '--expname', 'm1',
        '--basedir', str(tmp_path / 'render_output'), '--skip', '2',
        '--step_deg', '120'])
    render_mesh.main()

    outdir = tmp_path / 'render_output' / 'm1' / 'mesh_render'
    jpgs = sorted(p.name for p in outdir.glob('*.jpg'))
    # meshes 000 and 002 (skip=2), 3 views each (360/120)
    assert jpgs == ['000_000.jpg', '000_001.jpg', '000_002.jpg',
                    '002_000.jpg', '002_001.jpg', '002_002.jpg']
    import imageio
    assert imageio.imread(outdir / '000_000.jpg').shape[:2] == (48, 48)
