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


def mesh_axis_sizes(mesh: Mesh) -> Dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def _put_tree(mesh: Mesh, tree, spatial_axis_of):
    """device_put each leaf: axis 0 over 'data' (when divisible), and the
    leaf's spatial axis (per ``spatial_axis_of(ndim)``, -1 = none) over
    'spatial' when the mesh has one and the dim divides evenly. Indivisible
    dims replicate (graceful degradation, same policy as the inference
    engine's mesh handling)."""
    sizes = mesh_axis_sizes(mesh)
    dn, sn = sizes.get("data", 1), sizes.get("spatial", 1)

    def put(x):
        nd = np.ndim(x)
        spec = [None] * nd
        if nd >= 1 and dn > 1 and np.shape(x)[0] % dn == 0:
            spec[0] = "data"
        sa = spatial_axis_of(nd)
        if sa >= 0 and sa < nd and sn > 1 and np.shape(x)[sa] % sn == 0:
            spec[sa] = "spatial"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def shard_batch(mesh: Mesh, tree):
    """Shard a data batch: axis 0 over 'data'; for rank>=4 leaves
    ([B,T,H,W] seg / [B,T,H,W,C] img) the H axis (2) over 'spatial'.
    Rank<4 leaves (valid/full_seg/is_last vectors) shard batch only."""
    return _put_tree(mesh, tree, lambda nd: 2 if nd >= 4 else -1)


def shard_state(mesh: Mesh, tree):
    """Shard a ConvLSTM state pytree (leaves [B, h_l, w_l, F]): batch over
    'data', per-level height (axis 1) over 'spatial' — the same placement
    ``__graft_entry__.dryrun_multichip`` builds by hand. Per-leaf
    divisibility checks mean every level of a dp+sp-shardable model shards;
    a level whose h_l stops dividing replicates that leaf."""
    return _put_tree(mesh, tree, lambda nd: 1 if nd >= 4 else -1)
