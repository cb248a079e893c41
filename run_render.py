#!/usr/bin/env python
"""Render CLI (equivalent of reference run_render.py:988-1045).

Loads a trained experiment (args.txt + checkpoint — either a native orbax
checkpoint or a reference torch .tar), builds poses/cameras for the chosen
render mode, renders, optionally evaluates, writes pngs/mp4/bboxes.

Usage:
  python run_render.py --nerf_args logs/exp/args.txt \
      --ckptpath logs/exp/checkpoints \
      --dataset surreal --entry female --render_type bullet \
      --runname surreal_bullet [--eval]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def config_parser():
    p = argparse.ArgumentParser()
    p.add_argument('--config', type=str, default=None,
                   help='render config txt (reference configargparse '
                        'format, key = value per line; CLI flags override '
                        '— mirrors /root/reference/run_render.py:29)')
    p.add_argument('--nerf_args', type=str, required=True,
                   help='path to args.txt of the trained experiment')
    p.add_argument('--ckptpath', type=str, required=True,
                   help='path to checkpoint (orbax dir or reference .tar)')
    p.add_argument('--render_res', nargs='+', type=int, default=None,
                   help='(H, W) for rendering; default = training res')
    p.add_argument('--dataset', type=str, required=True)
    p.add_argument('--entry', type=str, required=True)
    p.add_argument('--white_bkgd', action='store_true')
    p.add_argument('--render_type', type=str, default='retarget')
    p.add_argument('--save_gt', action='store_true')
    p.add_argument('--fps', type=int, default=14)
    p.add_argument('--mesh_res', type=int, default=255)
    p.add_argument('--mesh_thres', type=float, default=10.0)
    p.add_argument('--mesh_overlay', action='store_true',
                   help='also composite the extracted mesh (normal-shaded) '
                        'over the GT frame — SMPL-overlay debug equivalent')
    p.add_argument('--render_refined', action='store_true')
    p.add_argument('--subject_idx', type=int, default=0)
    p.add_argument('--selected_idxs', nargs='+', type=int, default=None)
    p.add_argument('--selected_framecode', type=int, default=None)
    p.add_argument('--outputdir', type=str, default='render_output/')
    p.add_argument('--runname', type=str, required=True)
    p.add_argument('--eval', action='store_true')
    p.add_argument('--no_save', action='store_true')
    p.add_argument('--server', action='store_true',
                   help='persistent render server: load the model once, '
                        'then serve newline-delimited JSON render requests '
                        'on stdin (one JSON reply line per request)')
    p.add_argument('--port', type=int, default=None,
                   help='with --server: listen on a TCP socket instead of '
                        'stdin (0 = ephemeral; the bound port is in the '
                        'ready line). Same protocol, multiple concurrent '
                        'client connections, replies routed per connection.')
    p.add_argument('--coalesce', action='store_true',
                   help='with --server: batch same-resolution queued '
                        'requests into one dispatch. Off by default — '
                        'group size varies with drain timing, so every '
                        'new size recompiles; measured 5x aggregate-'
                        'throughput loss at 4-8 concurrent TCP clients '
                        'vs shape-stable per-request dispatches '
                        '(PERF.md round 5)')
    p.add_argument('--host', type=str, default='127.0.0.1',
                   help='with --server --port: bind address')
    return p


def load_model(args, nerf_args):
    """Load params from a native orbax ckpt or a reference .tar."""
    import jax

    from anerf_tpu.render.factory import (build_render_config,
                                          init_render_params)
    from anerf_tpu.skeleton import SMPLSkeleton
    from anerf_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache(getattr(nerf_args, 'xla_cache_dir', None))

    tau = 2000.0
    if args.ckptpath.endswith('.tar'):
        from anerf_tpu.pose.ckpt_compat import load_reference_checkpoint
        params, extras = load_reference_checkpoint(args.ckptpath)
        if extras['tau'] is not None:
            tau = extras['tau']
        n_views = None
        if 'framecodes' in params['coarse']:
            n_views = params['coarse']['framecodes']['codes'].shape[0]
        data_attrs = {'skel_type': SMPLSkeleton,
                      'n_views': n_views or 1, 'rest_pose': None}
        cfg = build_render_config(nerf_args, data_attrs)
        pose_sd = extras['poseopt_state_dict']
        return cfg, params, pose_sd, tau

    # native checkpoint: need data_attrs to rebuild the config/params tree
    from anerf_tpu.train.loop import get_dataset, setup
    import dataclasses
    nerf_args = dataclasses.replace(nerf_args, no_reload=False)
    ctx = setup(nerf_args)
    from anerf_tpu.train.trainer import derive_schedules
    import jax.numpy as jnp
    tau_arr, _ = derive_schedules(nerf_args, ctx.cfg, ctx.state.step)
    return ctx.cfg, ctx.state.params, None, float(tau_arr)


def build_pose_source(args, nerf_args, entry, pose_sd):
    """PoseSource from the entry h5 (or refined poses)."""
    import h5py

    from anerf_tpu.render.modes import PoseSource

    data_h5 = entry['data_h5']
    with h5py.File(data_h5, 'r', swmr=True) as f:
        kps = f['kp3d'][:]
        bones = f['bones'][:]
        c2ws = f['c2ws'][:]
        focals = f['focals'][:]
        rest_pose = f['rest_pose'][:]

    if args.render_refined and pose_sd is not None:
        from anerf_tpu.pose.ckpt_compat import pose_ckpt_to_pose_data
        kp3d, bones_r, _, _, rest_r, _ = pose_ckpt_to_pose_data(
            popt_sd=pose_sd)
        kps, bones, rest_pose = kp3d, bones_r, rest_r
    elif args.render_refined and entry.get('refined') and \
            os.path.exists(entry['refined']):
        from anerf_tpu.pose.ckpt_compat import pose_ckpt_to_pose_data
        kp3d, bones_r, _, _, rest_r, _ = pose_ckpt_to_pose_data(
            entry['refined'], legacy=True)
        kps, bones, rest_pose = kp3d, bones_r, rest_r

    return PoseSource(kps=kps, bones=bones, c2ws=c2ws, focals=focals,
                      rest_pose=rest_pose), data_h5


class RenderSession:
    """Model + pose source loaded ONCE; renders any number of requests.

    The serving backbone (no reference analog — the reference reloads
    the torch model per CLI invocation): the jitted bucketed renderer is
    cached per (config, bucket shape) inside render_path, and the
    persistent XLA compilation cache survives process restarts, so every
    request after the first pays zero compile and zero load time.
    """

    def __init__(self, args):
        from anerf_tpu.config import load_args_txt
        from anerf_tpu.render.catalog import init_catalog
        from anerf_tpu.utils.device_lock import acquire

        acquire()   # serialize tunnel clients BEFORE first backend touch
        self.nerf_args = load_args_txt(args.nerf_args)
        self.cfg, self.params, self.pose_sd, self.tau = load_model(
            args, self.nerf_args)
        self.catalog = init_catalog()[args.dataset][args.entry]
        self.src, self.data_h5 = build_pose_source(
            args, self.nerf_args, self.catalog, self.pose_sd)

        import h5py
        with h5py.File(self.data_h5, 'r', swmr=True) as f:
            img_shape = f['img_shape'][:]
        self.native_hw = (int(img_shape[1]), int(img_shape[2]))

        import jax
        self.mesh = None
        if len(jax.devices()) > 1:
            from anerf_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh()

    def prepare(self, args):
        """Resolve one request into render-ready pose/camera arrays.

        Pure host work (mode builders + focal scaling) — no device
        dispatch — so the server can coalesce several prepared requests
        into ONE render_path call (`render_prepared`), amortizing the
        pose-table upload and the per-call dispatch latency across
        requests. Mesh requests return a marker and render individually.
        """
        from anerf_tpu.render import modes

        pose_sd = self.pose_sd
        src = self.src
        H_native, W_native = self.native_hw

        mode_kwargs = dict(self.catalog.get(args.render_type, {}))
        if args.selected_idxs is not None:
            mode_kwargs['selected_idxs'] = np.array(args.selected_idxs)

        rtype = args.render_type
        if rtype == 'mesh':
            # meshes have no render resolution; overlays composite onto
            # the natively-stored GT frames
            return {'rtype': rtype, 'args': args,
                    'mode_kwargs': mode_kwargs}

        if args.render_res:
            assert len(args.render_res) == 2, 'render_res should be (H, W)'
            H, W = args.render_res
            # a non-native resolution keeps the field of view: intrinsics
            # scale with the image height (reference run_render.py:166-172)
            import dataclasses
            src = dataclasses.replace(
                src, focals=np.asarray(src.focals, np.float32)
                * (float(H) / float(H_native)))
        else:
            H, W = H_native, W_native

        def build_retarget(src_, **kw):
            kw.pop('is_surreal', None)
            kw.pop('is_neuralbody', None)
            return modes.load_retarget(src_, src_, kw.pop('selected_idxs'),
                                       kw.pop('length', 1),
                                       skip=kw.pop('skip', 1), **kw)

        def build_val(src_, **kw):
            for drop in ('length', 'skip', 'is_surreal', 'is_neuralbody'):
                kw.pop(drop, None)
            return modes.load_selected(src_, **kw)

        def build_correction(src_, **kw):
            refined_src = None
            if pose_sd is not None:
                from anerf_tpu.pose.ckpt_compat import pose_ckpt_to_pose_data
                kp3d, bones_r, _, _, rest_r, _ = pose_ckpt_to_pose_data(
                    popt_sd=pose_sd)
                refined_src = modes.PoseSource(
                    kps=kp3d, bones=bones_r, c2ws=src_.c2ws,
                    focals=src_.focals, rest_pose=rest_r)
            if refined_src is None:
                raise ValueError(
                    'correction mode needs a pose-opt checkpoint')
            return modes.load_correction(src_, refined_src, **kw)

        builders = {
            'bullet': modes.load_bullettime,
            'interpolate': modes.load_interpolate,
            'animate': modes.load_animate,
            'poserot': modes.load_pose_rotate,
            'bubble': modes.load_bubble,
            'selected': build_val,
            'val': build_val,
            'retarget': build_retarget,
            'correction': build_correction,
        }
        if rtype not in builders:
            raise NotImplementedError(f'render_type {rtype} not implemented')
        data = builders[rtype](src, **mode_kwargs)

        cam_idxs = data['cam_idxs']
        if args.selected_framecode is not None:
            cam_idxs = np.full_like(cam_idxs, args.selected_framecode)

        return {'rtype': rtype, 'args': args, 'mode_kwargs': mode_kwargs,
                'H': H, 'W': W, 'data': data, 'cam_idxs': cam_idxs}

    def render_prepared(self, preps):
        """Render one or more prepared requests in a SINGLE render_path
        dispatch (they must share (H, W) — callers group by resolution).
        Returns one output dict per prep, split back out of the stacked
        render_path result."""
        from anerf_tpu.render.render_path import render_path

        nerf_args = self.nerf_args
        H, W = preps[0]['H'], preps[0]['W']
        assert all((p['H'], p['W']) == (H, W) for p in preps)
        counts = [len(p['data']['c2ws']) for p in preps]

        def cat(key, getter=None):
            parts = [getter(p) if getter else p['data'][key] for p in preps]
            if any(x is None for x in parts):
                return None
            return np.concatenate([np.asarray(x) for x in parts], 0)

        out = render_path(
            self.params, self.cfg, cat('c2ws'),
            (H, W, cat('focals')), cat('kp3d'), cat('skts'),
            cat('bones', lambda p: p['data'].get('bones')),
            cam_idxs=cat('cam_idxs', lambda p: p['cam_idxs']),
            tau=self.tau, chunk=nerf_args.chunk,
            ext_scale=nerf_args.ext_scale, white_bkgd=True,
            use_framecode_idx=nerf_args.opt_framecode, mesh=self.mesh,
            verbose=True)

        outs, off = [], 0
        for n in counts:
            outs.append({k: v[off:off + n] for k, v in out.items()})
            off += n
        return outs

    def finish(self, args, prep, out):
        """Per-request post-processing: write pngs/mp4/bboxes, evaluate."""
        import imageio

        rtype, mode_kwargs = prep['rtype'], prep['mode_kwargs']
        H, W = prep['H'], prep['W']
        outdir = os.path.join(args.outputdir, args.dataset, args.runname)
        os.makedirs(os.path.join(outdir, 'image'), exist_ok=True)
        if not args.no_save:
            for i, rgb in enumerate(out['rgbs']):
                imageio.imwrite(
                    os.path.join(outdir, 'image', f'{i:05d}.png'),
                    (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            np.save(os.path.join(outdir, 'bboxes.npy'), out['bboxes'])
            try:
                imageio.mimwrite(
                    os.path.join(outdir, f'{args.runname}.mp4'),
                    (np.clip(out['rgbs'], 0, 1) * 255).astype(np.uint8),
                    fps=args.fps)
            except Exception as e:
                print(f'video write skipped: {e}')

        if args.eval:
            if rtype not in EVAL_MODES:
                raise ValueError(
                    f'--eval is only supported for {EVAL_MODES}; {rtype} '
                    f'outputs do not map 1:1 onto GT frames')
            out['eval'] = evaluate(args, out, self.data_h5, mode_kwargs,
                                   outdir, H, W)
        return out

    def render_once(self, args):
        prep = self.prepare(args)
        if prep['rtype'] == 'mesh':
            return render_mesh_mode(args, self.cfg, self.params, self.src,
                                    prep['mode_kwargs'], self.tau,
                                    data_h5=self.data_h5,
                                    hw=self.native_hw)
        out = self.render_prepared([prep])[0]
        return self.finish(args, prep, out)


def run_render(args):
    return RenderSession(args).render_once(args)


# request fields a server client may override per render (everything else
# is fixed at session load: checkpoint, dataset/entry, pose refinement)
SERVE_KEYS = frozenset((
    'render_type', 'selected_idxs', 'selected_framecode', 'render_res',
    'runname', 'outputdir', 'eval', 'fps', 'no_save', 'save_gt',
    'mesh_res', 'mesh_thres', 'mesh_overlay'))


MAX_BATCH = 16  # requests coalesced into one dispatch


def _process_batch(sess, base_args, lines):
    """Parse + render one coalesced batch of request lines against a live
    RenderSession. Returns (replies, quitting): one reply dict per
    non-blank line, in request order (requests drained after a quit are
    dropped). With base_args.coalesce, compatible requests (same
    resolution, non-mesh) share ONE render_path dispatch; by default each
    request gets its own shape-stable dispatch. Both the stdio and the
    TCP front-ends run this core."""
    import argparse
    import json
    import time

    def parse(line):
        req = json.loads(line)
        if not isinstance(req, dict):
            raise ValueError('request must be a JSON object')
        if req.get('cmd') == 'quit':
            return 'quit'
        bad = set(req) - SERVE_KEYS
        if bad:
            raise ValueError(f'unknown request fields {sorted(bad)}; '
                             f'allowed: {sorted(SERVE_KEYS)}')
        return argparse.Namespace(**{**vars(base_args), **req})

    quitting = False
    # parse all drained lines; order of replies == order of requests
    slots = []   # ('args', ns) | ('res', reply-dict) | ('quit',)
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        try:
            p = parse(ln)
            if p == 'quit':
                slots.append(('quit', None))
                quitting = True
                break            # ignore anything queued after quit
            slots.append(('args', p))
        except Exception as e:
            slots.append(('res', {'ok': False,
                                  'error': f'{type(e).__name__}: {e}'}))

    # prepare renderable requests; with --coalesce, group compatible ones
    # (same resolution, non-mesh) into a single dispatch. Default is one
    # dispatch per request: coalesced group SIZE depends on drain timing,
    # so under concurrent clients every new size is a fresh compile —
    # measured 5x aggregate-throughput loss at 4-8 TCP clients vs
    # shape-stable per-request dispatches (PERF.md round 5; the
    # controlled same-shape comparison already had coalescing 17% slower,
    # round 3).
    coalesce = getattr(base_args, 'coalesce', False)
    preps, groups = {}, {}
    for i, (kind, val) in enumerate(slots):
        if kind != 'args':
            continue
        try:
            prep = sess.prepare(val)
        except Exception as e:
            slots[i] = ('res', {'ok': False,
                                'error': f'{type(e).__name__}: {e}'})
            continue
        preps[i] = prep
        if prep['rtype'] != 'mesh':
            key = (prep['H'], prep['W']) if coalesce else ('solo', i)
            groups.setdefault(key, []).append(i)

    t_batch = time.perf_counter()
    outs, group_size, render_s = {}, {}, {}
    for idxs in groups.values():
        try:
            t_g = time.perf_counter()
            for i, o in zip(idxs, sess.render_prepared(
                    [preps[i] for i in idxs])):
                outs[i] = o
                group_size[i] = len(idxs)
            for i in idxs:
                render_s[i] = time.perf_counter() - t_g
        except Exception as e:
            for i in idxs:
                slots[i] = ('res', {'ok': False,
                                    'error': f'{type(e).__name__}: {e}'})

    replies = []
    for i, (kind, val) in enumerate(slots):
        if kind == 'quit':
            replies.append({'ok': True, 'bye': True})
            continue
        if kind == 'res':                         # one bad request must not
            replies.append(val)                   # kill the server
            continue
        r_args, prep = val, preps[i]
        try:
            t0 = time.perf_counter()
            if prep['rtype'] == 'mesh':
                out = sess.render_once(r_args)
            else:
                out = sess.finish(r_args, prep, outs[i])
            res = {'ok': True, 'runname': r_args.runname,
                   'outdir': os.path.join(r_args.outputdir,
                                          base_args.dataset,
                                          r_args.runname),
                   'seconds': round(time.perf_counter() - t0, 3)}
            if i in render_s:   # device render time of this request's
                res['render_seconds'] = round(render_s[i], 3)  # dispatch
            if group_size.get(i, 1) > 1:
                res['batched'] = group_size[i]
                res['batch_seconds'] = round(
                    time.perf_counter() - t_batch, 3)
            if out is not None and 'rgbs' in out:
                res['n_frames'] = int(len(out['rgbs']))
            if out is not None and 'eval' in out:
                res['eval'] = {k: float(v)
                               for k, v in out['eval'].items()}
        except Exception as e:
            res = {'ok': False,
                   'error': f'{type(e).__name__}: {e}'}
        replies.append(res)
    return replies, quitting


def serve(args, stdin=None, stdout=None):
    """Persistent render server: one loaded model, newline-delimited JSON
    requests on stdin, one JSON reply line per request on stdout.

    Request: {"render_type": "bullet", "selected_idxs": [0, 2],
              "runname": "r1", ...}  (SERVE_KEYS only)
    Reply:   {"ok": true, "runname": "r1", "n_frames": 6,
              "outdir": "...", "seconds": 1.2[, "eval": {...}]}
    {"cmd": "quit"} (or EOF) shuts the server down.
    """
    import json
    import sys
    import time

    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout

    def reply(obj):
        stdout.write(json.dumps(obj) + '\n')
        stdout.flush()

    t0 = time.perf_counter()
    sess = RenderSession(args)
    reply({'ok': True, 'ready': True,
           'load_seconds': round(time.perf_counter() - t0, 3),
           'dataset': args.dataset, 'entry': args.entry,
           'serve_keys': sorted(SERVE_KEYS)})

    def has_pending(stream):
        """More input immediately available? (select for real pipes;
        in-memory test streams report whatever is already written)"""
        try:
            fd = stream.fileno()
        except Exception:
            pos = stream.tell()
            more = bool(stream.readline())
            stream.seek(pos)
            return more
        import select
        return bool(select.select([fd], [], [], 0)[0])

    quitting = False
    while not quitting:
        line = stdin.readline()
        if not line:
            break
        lines = [line]
        # drain whatever is already queued (quit handling + reply
        # pipelining; with --coalesce the drained batch also shares one
        # render_path dispatch)
        while len(lines) < MAX_BATCH and has_pending(stdin):
            nxt = stdin.readline()
            if not nxt:
                break
            lines.append(nxt)

        replies, quitting = _process_batch(sess, args, lines)
        for res in replies:
            reply(res)


def serve_tcp(args, host='127.0.0.1', port=0, stdout=None):
    """TCP front-end over the same request-batch core as serve().

    Listens on host:port (port 0 = ephemeral; the bound port is printed in
    the ready line). Each client connection speaks the stdio protocol —
    newline-delimited JSON requests, one JSON reply line per request, in
    order, routed back to the requesting connection. Requests arriving
    concurrently from different connections drain into one processing
    batch like queued stdin lines (one shape-stable dispatch per request
    by default; --coalesce shares a dispatch). {"cmd": "quit"} from any
    client stops the server (it is an operator surface, not a public one);
    a disconnecting client only closes its own connection.

    No reference analog (the reference has no serving story) — this is the
    VERDICT r3 #7 surface decision: serving is IN scope, as a thin
    transport over RenderSession.
    """
    import json
    import queue
    import socket
    import sys
    import threading
    import time

    stdout = stdout if stdout is not None else sys.stdout

    t0 = time.perf_counter()
    sess = RenderSession(args)

    srv = socket.create_server((host, port))
    bound_port = srv.getsockname()[1]
    stdout.write(json.dumps(
        {'ok': True, 'ready': True, 'port': bound_port,
         'load_seconds': round(time.perf_counter() - t0, 3),
         'dataset': args.dataset, 'entry': args.entry,
         'serve_keys': sorted(SERVE_KEYS)}) + '\n')
    stdout.flush()

    inq = queue.Queue()   # (conn, wlock, line-or-None[EOF])
    stop = threading.Event()

    def reader(conn):
        wlock = threading.Lock()
        try:
            f = conn.makefile('r', encoding='utf-8')
            for line in f:
                inq.put((conn, wlock, line))
        except Exception:
            pass
        inq.put((conn, wlock, None))

    def acceptor():
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                break     # listener closed during shutdown
            threading.Thread(target=reader, args=(conn,),
                             daemon=True).start()

    threading.Thread(target=acceptor, daemon=True).start()

    def send(conn, wlock, obj):
        try:
            with wlock:
                conn.sendall((json.dumps(obj) + '\n').encode())
        except Exception:
            pass          # client gone: drop its reply, keep serving

    quitting = False
    while not quitting:
        item = inq.get()
        batch = [item]
        while len(batch) < MAX_BATCH:
            try:
                batch.append(inq.get_nowait())
            except queue.Empty:
                break
        # EOF markers close their connection; the rest coalesce
        live = []
        for conn, wlock, line in batch:
            if line is None:
                try:
                    conn.close()
                except Exception:
                    pass
            elif line.strip():
                # blank lines get no reply (stdio semantics); filtering
                # here keeps the live<->replies zip aligned
                live.append((conn, wlock, line))
        if not live:
            continue
        replies, quitting = _process_batch(
            sess, args, [line for _, _, line in live])
        # _process_batch drops requests drained after a quit; their
        # clients get an explicit shutdown notice instead of silence
        for (conn, wlock, _), res in zip(live, replies):
            send(conn, wlock, res)
        for conn, wlock, _ in live[len(replies):]:
            send(conn, wlock, {'ok': False, 'error': 'server shutting down'})

    stop.set()
    srv.close()


# modes whose outputs correspond 1:1 to GT frames at `selected_idxs`
# (the reference only evaluates val-like modes; e.g. bullet renders
# n_views per pose, so GT alignment is undefined there)
EVAL_MODES = ('val', 'selected', 'retarget', 'correction')


def evaluate(args, out, data_h5, mode_kwargs, outdir, H, W):
    """Box-cropped PSNR/SSIM against held-out frames
    (reference run_render.py:883-968)."""
    import h5py

    from anerf_tpu.utils.metrics import evaluate_metric_arrays

    sel = np.asarray(mode_kwargs.get('selected_idxs'))
    if sel.ndim == 0 or sel.size == 0 or len(out['rgbs']) != len(sel):
        raise ValueError(
            f"--eval needs renders mapping 1:1 onto GT frames: got "
            f"{len(out['rgbs'])} renders for {sel.size} selected_idxs "
            f"(supported modes: {EVAL_MODES})")
    # h5py fancy indexing needs increasing unique indices; read at the
    # sorted positions then invert back so GT frames line up with the
    # render order (renders follow `sel` as given, not sorted).
    uniq, inv = np.unique(sel, return_inverse=True)
    with h5py.File(data_h5, 'r', swmr=True) as f:
        if 'img_shape' in f:
            Hn, Wn = int(f['img_shape'][1]), int(f['img_shape'][2])
        else:
            Hn, Wn = H, W  # GT stored at the render resolution
        gts = f['imgs'][uniq].reshape(
            -1, Hn, Wn, 3).astype(np.float32)[inv] / 255.
        fgs = f['masks'][uniq].reshape(-1, Hn, Wn, 1)[inv]
    if (Hn, Wn) != (H, W):
        # GT lives at the native resolution; rendering happened at
        # --render_res — compare in render space
        import cv2
        gts = np.stack([cv2.resize(g, (W, H),
                                   interpolation=cv2.INTER_AREA)
                        for g in gts])
        fgs = np.stack([cv2.resize(m.astype(np.float32), (W, H),
                                   interpolation=cv2.INTER_NEAREST)
                        for m in fgs])[..., None]
    metrics = evaluate_metric_arrays(out['rgbs'], gts, fgs=fgs,
                                     boxes=out['bboxes'])
    print('eval:', metrics)
    with open(os.path.join(outdir, 'metrics.txt'), 'w') as f:
        for k, v in metrics.items():
            f.write(f'{k}: {v}\n')
    return metrics


def render_mesh_mode(args, cfg, params, src, mode_kwargs, tau,
                     data_h5=None, hw=None):
    """Marching-tetrahedra mesh extraction (reference run_render.py:970-986
    with PyMCubes replaced by utils/marching.py). With --mesh_overlay the
    extracted mesh is also composited normal-shaded over the GT frame —
    the debug-overlay substitute for the reference's pyrender SMPL
    renderer (core/misc/renderer.py:7-83)."""
    import jax.numpy as jnp

    from anerf_tpu.ops.fk import get_smpl_l2ws_np
    from anerf_tpu.render.raycaster import render_mesh_density
    from anerf_tpu.utils.marching import marching_tetrahedra, save_ply

    sel = mode_kwargs.get('selected_idxs', np.array([0]))
    outdir = os.path.join(args.outputdir, args.dataset, args.runname,
                          'meshes')
    os.makedirs(outdir, exist_ok=True)
    radius = 1.3
    res = args.mesh_res
    for i in sel:
        bones = src.bones[i]
        l2ws = get_smpl_l2ws_np(bones, src.rest_pose)
        l2ws[..., :3, -1] += src.kps[i, :1]
        kps = l2ws[..., :3, -1][None]
        skts = np.linalg.inv(l2ws)[None]
        sigma = np.asarray(render_mesh_density(
            params, cfg, jnp.asarray(kps), jnp.asarray(skts),
            jnp.asarray(bones[None]), radius=radius, res=res,
            tau=jnp.float32(tau)))
        verts, faces = marching_tetrahedra(sigma, args.mesh_thres)
        # voxel -> world coordinates
        verts = verts / res * 2 * radius - radius + src.kps[i, 0]
        path = os.path.join(outdir, f'mesh_{i:05d}.ply')
        save_ply(path, verts, faces)
        print(f'saved {path}: {len(verts)} verts, {len(faces)} faces')

        if args.mesh_overlay:
            import h5py
            import imageio

            from anerf_tpu.ops.rays import nerf_c2w_to_extrinsic
            from anerf_tpu.utils.mesh_render import overlay_mesh_on_image

            H, W = hw
            with h5py.File(data_h5, 'r', swmr=True) as f:
                gt = f['imgs'][int(i)].reshape(H, W, 3).astype(
                    np.float32) / 255.
            ext = nerf_c2w_to_extrinsic(np.asarray(src.c2ws[i], np.float32))
            over = overlay_mesh_on_image(
                verts, faces, gt, ext, src.focals_at(np.array([i]))[0])
            opath = os.path.join(outdir, f'overlay_{i:05d}.png')
            imageio.imwrite(opath, (np.clip(over, 0, 1) * 255).astype(
                np.uint8))
            print(f'saved {opath}')


def _argv_from_config(path):
    """Expand a reference-format render config txt (key = value) into argv
    tokens. Prepended before the real CLI argv so explicit flags override
    (argparse last-wins). Booleans follow the reference's configargparse
    semantics (true/false words); list values split on whitespace."""
    tokens = []
    with open(path) as f:
        for line in f:
            line = line.split('#', 1)[0].strip()
            if not line or '=' not in line:
                continue
            key, val = (s.strip() for s in line.split('=', 1))
            if key == 'config':
                continue
            if val.lower() in ('true', 'false'):
                if val.lower() == 'true':
                    tokens.append(f'--{key}')
                continue
            tokens.append(f'--{key}')
            tokens.extend(val.replace('[', ' ').replace(']', ' ')
                          .replace(',', ' ').split())
    return tokens


if __name__ == '__main__':
    import sys
    _argv = sys.argv[1:]
    if '--config' in _argv:
        _cfg_path = _argv[_argv.index('--config') + 1]
        _argv = _argv_from_config(_cfg_path) + _argv
    _args = config_parser().parse_args(_argv)
    if _args.server and _args.port is not None:
        serve_tcp(_args, host=_args.host, port=_args.port)
    elif _args.server:
        serve(_args)
    else:
        run_render(_args)
