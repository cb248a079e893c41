"""Metrics logging: JSONL always; TensorBoard when available.

Mirrors the reference's SummaryWriter usage (run_nerf.py:528-616): per-loss
scalars, stats (psnr, alpha, lrate, tau, grad norms, MPJPC), validation
metrics/images. The JSONL stream is the source of truth (grep/pandas-able);
TB is an optional view via torch.utils.tensorboard.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


class MetricsLogger:

    def __init__(self, exp_dir: str, use_tensorboard: bool = True):
        self.jsonl = open(os.path.join(exp_dir, 'metrics.jsonl'), 'a')
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(os.path.join(exp_dir, 'tb'))
            except Exception:
                self.tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float],
                    prefix: str = '') -> None:
        rec = {'step': step}
        for k, v in scalars.items():
            rec[f'{prefix}{k}'] = float(v)
        self.jsonl.write(json.dumps(rec) + '\n')
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f'{prefix}{k}', float(v), step)

    def log_images(self, step: int, tag: str, images: np.ndarray) -> None:
        """images (N, H, W, 3) in [0, 1]."""
        if self.tb is not None:
            import torch
            self.tb.add_images(tag, torch.tensor(
                np.clip(images, 0, 1)).permute(0, 3, 1, 2), step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class DeviceProfiler:
    """jax.profiler trace capture around a window of steps
    (SURVEY §5 tracing: replaces the reference's unused torch profiler
    import with a real device trace)."""

    def __init__(self, exp_dir: str, start_step: int = -1,
                 num_steps: int = 5):
        self.dir = os.path.join(exp_dir, 'profile')
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int):
        if step == self.start_step and not self._active:
            import jax
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            import jax
            jax.profiler.stop_trace()
            self._active = False
