"""Batch assembly + background prefetching feeding the device.

Replaces the reference's DataLoader worker pool + pin_memory + collate
(core/load_data.py:78-80, core/dataset.py:748-820): a RayImageSampler-
equivalent permutation stream picks N_images per iteration, the batcher packs
fixed-shape numpy arrays in the train-step contract, and a small thread pool
keeps a queue of ready batches so host IO overlaps device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List

import numpy as np


class ImagePermutationSampler:
    """Yields image indices such that every image is sampled once per epoch
    (reference RandIntGenerator + RayImageSampler, dataset.py:748-811)."""

    def __init__(self, n: int, n_images: int, seed: int = 0):
        self.n = n
        self.n_images = n_images
        self.rng = np.random.default_rng(seed)
        self._stream = iter(())

    def _refill(self):
        return iter(self.rng.permutation(self.n))

    def next_batch(self) -> np.ndarray:
        batch = []
        while len(batch) < self.n_images:
            try:
                batch.append(next(self._stream))
            except StopIteration:
                self._stream = self._refill()
        return np.sort(np.array(batch, dtype=np.int64))


def assemble_batch(dataset, img_idxs: np.ndarray) -> Dict[str, np.ndarray]:
    """Pack per-image samples into the flat train-step batch contract."""
    items = [dataset.get_item(int(i)) for i in img_idxs]
    n_images = len(items)
    n_per = items[0]['rays_o'].shape[0]

    def cat(key):
        return np.concatenate([it[key] for it in items], axis=0)

    rays_o = cat('rays_o')
    rays_d = cat('rays_d')
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    R = rays_o.shape[0]
    near = np.zeros((R, 1), np.float32)
    far = np.ones((R, 1), np.float32)
    rays = np.concatenate([rays_o, rays_d, near, far, viewdirs],
                          axis=-1).astype(np.float32)

    pose_idx = np.repeat(np.arange(n_images, dtype=np.int32), n_per)
    cam_idxs = np.repeat(
        np.array([it['cam_idxs'] for it in items], dtype=np.int32), n_per)

    batch = {
        'rays': rays,
        'target_s': cat('target_s').astype(np.float32),
        'fgs': cat('fgs').astype(np.float32),
        'bgs': (cat('bgs').astype(np.float32)
                if items[0]['bgs'] is not None else np.ones((R, 3),
                                                            np.float32)),
        'cam_idxs': cam_idxs,
        'pose_idx': pose_idx,
        'kp_idxs': np.array([it['kp_idx'] for it in items], dtype=np.int32),
        'kp3d': np.concatenate([it['kp3d'] for it in items]).astype(
            np.float32),
        'bones': np.concatenate([it['bones'] for it in items]).astype(
            np.float32),
        'skts': np.concatenate([it['skts'] for it in items]).astype(
            np.float32),
        'cyls': np.concatenate([it['cyls'] for it in items]).astype(
            np.float32),
    }
    if 'temp_val' in items[0]:
        batch['temp_val'] = np.array([it['temp_val'] for it in items],
                                     dtype=np.float32)
    if 'subject_idxs' in items[0]:
        batch['subject_idxs'] = np.array(
            [it['subject_idxs'] for it in items], dtype=np.int32)
    return batch


class BatchLoader:
    """Iterator of ready batches fed by a prefetching thread pool.

    Index batches are drawn from the sampler under a lock (global
    once-per-epoch coverage is preserved); workers assemble batches
    concurrently — h5 reads and the native sampling/gather extension release
    the GIL, so threads scale without worker processes (the reference uses
    16 DataLoader processes + pickling instead, core/load_data.py:78-80).
    """

    def __init__(self, dataset, n_images: int, prefetch: int = 6,
                 seed: int = 0, num_workers: int = 2,
                 stack: int = 1, stack_fn=None):
        self.dataset = dataset
        self.sampler = ImagePermutationSampler(len(dataset), n_images, seed)
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)
        # stack > 1: workers emit pre-stacked scan-unroll super-batches, so
        # the train loop's per-dispatch host work is just the device upload
        # (the numpy stack of K batches was a measured main-thread cost)
        self.stack = max(1, stack)
        self.stack_fn = stack_fn
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._sampler_lock = threading.Lock()

    def _make(self):
        if self.stack == 1:
            with self._sampler_lock:
                idxs = self.sampler.next_batch()
            return assemble_batch(self.dataset, idxs)
        with self._sampler_lock:
            # one lock hold for the whole super-batch keeps the sampler's
            # once-per-epoch coverage contiguous per dispatch
            idx_list = [self.sampler.next_batch() for _ in range(self.stack)]
        batches = [assemble_batch(self.dataset, i) for i in idx_list]
        return self.stack_fn(batches)

    def _worker(self):
        while not self._stop.is_set():
            batch = self._make()
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def start(self):
        if not self._threads:
            for _ in range(self.num_workers):
                t = threading.Thread(target=self._worker, daemon=True)
                t.start()
                self._threads.append(t)
        return self

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self.start()
        while True:
            yield self._q.get()

    def next(self) -> Dict[str, np.ndarray]:
        if not self._threads:
            return self._make()     # synchronous fallback
        return self._q.get()

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        self._threads = []
