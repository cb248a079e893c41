"""The h5 dataset schema: bit-compatible reader/writer.

The reference stores preprocessed datasets as a single .h5 with images
flattened to (N, H*W, C) and chunked for fast pixel indexing
(core/process_spin.py:234-296). This module reproduces that schema exactly so
the reference's preprocessed datasets load unmodified, and so files written
here load in the reference.

Keys: img_shape (4,), imgs/masks (N, H*W, C) uint8 chunked,
sampling_masks (N, H*W, 1) whole-image chunks, bkgds (N_bg, H*W, 3),
bkgd_idxs (N,), kp3d/gt_kp3d (N_kp, J, 3), bones (N_kp, J, 3),
skts (N_kp, J, 4, 4), cyls (N_kp, 5), rest_pose (J, 3), betas (1, 10),
c2ws (N, 4, 4), focals (N,) [optional centers (N, 2)], ext_scale ().
"""
from __future__ import annotations

from typing import Dict, Iterable

import h5py
import numpy as np


def write_h5(filename: str, data: Dict[str, np.ndarray],
             img_chunk_size: int = 64, compression: str = 'gzip') -> None:
    """Write a dataset dict to the canonical h5 layout."""
    imgs = data['imgs']
    H, W = imgs.shape[1:3]

    img_to_chunk = ['imgs', 'bkgds', 'masks']
    img_to_keep_whole = ['sampling_masks']
    redundants = ['index', 'img_path']
    data = {k: v for k, v in data.items() if k not in redundants}

    chunk = (1, min(int(img_chunk_size ** 2), H * W))
    whole = (1, H * W)

    with h5py.File(filename, 'w') as f:
        ds = f.create_dataset('img_shape', (4,), np.int32)
        ds[:] = np.array(imgs.shape)

        for k, v in data.items():
            if not isinstance(v, Iterable):
                ds = f.create_dataset(k, (), type(v))
                ds[()] = v
                continue
            v = np.asarray(v)
            if k in img_to_chunk or k in img_to_keep_whole:
                C = v.shape[-1]
                N = v.shape[0]
                data_chunk = (chunk if k in img_to_chunk else whole) + (C,)
                flat = (N, H * W, C)
                ds = f.create_dataset(k, flat, v.dtype, chunks=data_chunk,
                                      compression=compression)
                for i in range(N):
                    ds[i] = v[i].reshape(*flat[1:])
            elif k == 'img_paths':
                paths = v.astype('S')
                ds = f.create_dataset(k, (len(paths),), paths.dtype)
                ds[:] = paths
            else:
                if np.issubdtype(v.dtype, np.floating):
                    dtype = np.float32
                elif np.issubdtype(v.dtype, np.integer):
                    dtype = np.int64
                else:
                    raise NotImplementedError(
                        f'unknown dtype for {k}: {v.dtype}')
                ds = f.create_dataset(k, v.shape, dtype,
                                      compression=compression)
                ds[:] = v


def dataset_keys(path: str):
    with h5py.File(path, 'r', swmr=True) as f:
        return list(f.keys())
