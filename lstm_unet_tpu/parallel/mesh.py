"""Device mesh + sharding helpers.

No reference analog: arbellea/LSTM-UNet is single-process/single-GPU with no
distributed code (SURVEY.md §2 parallelism checklist — all strategies "No").
This module is the rebuild's first-class data-parallel layer:

- mesh axis ``'data'``: batch lanes (whole sequences per chip, so ConvLSTM
  state never crosses chips and collectives are gradient psums over ICI)
- optional mesh axis ``'spatial'``: H-dimension sharding with halo exchange
  for frames larger than one chip's HBM (the recurrence analog of context
  parallelism — SURVEY.md §2 SP/CP row); see ``halo.py``.

Gradient all-reduce is inserted by XLA from the sharding annotations (the
scaling-book recipe: pick a mesh, annotate, let XLA place collectives).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from {'data': N} / {'data': N, 'spatial': M}."""
    devices = list(devices if devices is not None else jax.devices())
    mesh_shape = dict(mesh_shape or {"data": len(devices)})
    names = tuple(mesh_shape.keys())
    sizes = tuple(mesh_shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, names)


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard axis `batch_axis` over 'data'; replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put every leaf with its batch axis 0 sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree)
