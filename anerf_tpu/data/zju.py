"""ZJU-MoCap / NeuralBody dataset: multi-camera with explicit kp/cam index
tables, per-image centers and dual focals.

Mirrors reference core/load_zju.py:536-640.
"""
from __future__ import annotations

import h5py
import numpy as np

from .dataset import BaseH5Dataset


class ZJUMocapDataset(BaseH5Dataset):

    N_render = 15
    render_skip = 63

    def init_meta(self):
        if self.split == 'test':
            self.h5_path = self.h5_path.replace('train', 'test')
        super().init_meta()
        with h5py.File(self.h5_path, 'r', swmr=True) as f:
            self.kp_idxs_table = f['kp_idxs'][:]
            self.cam_idxs_table = f['img_pose_indices'][:]
        if self.split == 'test':
            n_unique_cam = len(np.unique(self.cam_idxs_table))
            self.kp_idxs_table = self.kp_idxs_table // n_unique_cam

    def get_kp_idx(self, idx, q_idx):
        return self.kp_idxs_table[idx], q_idx

    def get_cam_idx(self, idx, q_idx):
        return self.cam_idxs_table[idx], q_idx

    def _get_subset_idxs(self, render=False):
        if self._idx_map is not None:
            i_idxs = self._idx_map
            _k = _c = self._idx_map
            _kq = _cq = np.arange(len(self._idx_map))
        else:
            i_idxs = np.arange(self._N_total_img)
            _k = _kq = np.arange(self._N_total_img)
            _c = _cq = np.arange(self._N_total_img)
        k_idxs, kq_idxs = self.get_kp_idx(_k, _kq)
        c_idxs, cq_idxs = self.get_cam_idx(_c, _cq)
        return k_idxs, c_idxs, i_idxs, kq_idxs, cq_idxs


class ZJUH36MDataset(ZJUMocapDataset):

    N_render = 30
    render_skip = 1

    def init_meta(self):
        super().init_meta()
        idxs = np.arange(len(self.kp_idxs_table))
        train_idxs, val_idxs = idxs[:-30], idxs[-30:]
        if self.split == 'train':
            self._idx_map = train_idxs
        elif self.split == 'val':
            self._idx_map = val_idxs
        self.init_len()
