#!/usr/bin/env python
"""Turntable-render extracted .ply meshes (reference render_mesh.py CLI).

Usage:
  python render_mesh.py --expname surreal_mesh \
      --mesh_dir render_output/surreal/run/meshes --outputdir mesh_render/
"""
import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--expname', type=str, default='mesh')
    p.add_argument('--mesh_dir', type=str, required=True,
                   help='directory of .ply meshes')
    p.add_argument('--outputdir', type=str, default='mesh_render/')
    p.add_argument('--res', type=int, default=512)
    p.add_argument('--step_deg', type=float, default=4.0)
    p.add_argument('--fps', type=int, default=14)
    args = p.parse_args()

    import imageio

    from anerf_tpu.utils.marching import load_ply
    from anerf_tpu.utils.mesh_render import render_turntable

    outdir = os.path.join(args.outputdir, args.expname)
    os.makedirs(outdir, exist_ok=True)

    for ply in sorted(glob.glob(os.path.join(args.mesh_dir, '*.ply'))):
        name = os.path.splitext(os.path.basename(ply))[0]
        verts, faces = load_ply(ply)
        frames = render_turntable(verts, faces, step_deg=args.step_deg,
                                  res=args.res)
        for i, f in enumerate(frames):
            imageio.imwrite(os.path.join(outdir, f'{name}_{i:03d}.jpg'),
                            (np.clip(f, 0, 1) * 255).astype(np.uint8))
        try:
            imageio.mimwrite(os.path.join(outdir, f'{name}.mp4'),
                             (np.clip(frames, 0, 1) * 255).astype(np.uint8),
                             fps=args.fps)
        except Exception as e:
            print(f'video write skipped: {e}')
        print(f'{name}: {len(frames)} views -> {outdir}')


if __name__ == '__main__':
    main()
