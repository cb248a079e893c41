"""Device mesh + sharding helpers.

The framework's distributed story (SURVEY §2.2): the reference scatters ray
chunks over local GPUs with nn.DataParallel (core/raycasters.py:157); here
rays are sharded over a 1-D `data` mesh axis with NamedSharding and the
gradient all-reduce is emitted by jit's partitioner over ICI. Model params
(0.6 M) are replicated. TP/PP/EP are deliberately absent — the reference has
no model large enough to shard (SURVEY §2.2) — but the mesh module is the
single place to grow axes later.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """Shard the ray axis across the data axis. `stacked` batches carry a
    leading scan-unroll axis, so the ray axis is axis 1."""
    spec = P(None, DATA_AXIS) if stacked else P(DATA_AXIS)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ray_batch(mesh: Mesh, batch: Dict[str, Any],
                    ray_keys=('rays', 'target_s', 'fgs', 'bgs', 'cam_idxs',
                              'pose_idx'),
                    stacked: bool = False) -> Dict[str, Any]:
    """Place per-ray arrays sharded on the data axis and everything else
    (per-image pose tables, frame indices) replicated."""
    data = batch_sharding(mesh, stacked)
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        sh = data if k in ray_keys else rep
        out[k] = jax.device_put(v, sh)
    return out


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
