"""Spatial parallelism: halo-exchange convolution via shard_map + ppermute.

No reference analog (SURVEY.md §2 SP/CP row: the reference has no sequence/
context parallelism at all; its long-sequence story is recurrence). For this
framework the spatial axis IS the context-parallel analog: frames too large
for one chip's HBM shard their H dimension across the 'spatial' mesh axis,
and convolutions exchange `kernel//2` boundary rows with mesh neighbors over
ICI (`jax.lax.ppermute`) before convolving locally.

Two ways to get this behavior:
1. implicit — annotate H as sharded and let XLA's SPMD partitioner insert
   the halos (what the engine and __graft_entry__.dryrun_multichip use);
2. explicit — this module's shard_map kernel, for when the schedule must be
   owned (e.g. to overlap the halo transfer with interior compute, or to
   fuse into Pallas kernels later).

Both produce bit-identical results to the unsharded conv (tested).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _exchange_halo_h(xl: jax.Array, halo: int, axis: str) -> jax.Array:
    """Concat neighbors' boundary rows onto a local [B, Hs, W, C] block.

    Edge shards receive zeros (= SAME zero-padding of the global conv).
    """
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    bottom = xl[:, -halo:]  # rows my lower neighbor needs
    top = xl[:, :halo]      # rows my upper neighbor needs
    # receive from i-1 (their bottom) and from i+1 (their top); ICI ring
    from_above = jax.lax.ppermute(bottom, axis,
                                  [(j, (j + 1) % n) for j in range(n)])
    from_below = jax.lax.ppermute(top, axis,
                                  [(j, (j - 1) % n) for j in range(n)])
    from_above = jnp.where(i == 0, jnp.zeros_like(from_above), from_above)
    from_below = jnp.where(i == n - 1, jnp.zeros_like(from_below), from_below)
    return jnp.concatenate([from_above, xl, from_below], axis=1)


def halo_conv2d(x: jax.Array, kernel: jax.Array,
                bias: Optional[jax.Array] = None, *,
                mesh: Mesh, spatial_axis: str = "spatial") -> jax.Array:
    """SAME conv2d on an H-sharded [B,H,W,C] array with explicit ICI halos.

    Equivalent to ops.conv.conv2d on the gathered array; H must divide the
    'spatial' mesh axis size and the kernel height must be odd.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh % 2 != 1:
        raise ValueError("halo_conv2d needs an odd kernel height")
    halo = kh // 2

    def local(xl, k, b):
        xp = _exchange_halo_h(xl, halo, spatial_axis) if halo else xl
        y = jax.lax.conv_general_dilated(
            xp, k.astype(xl.dtype), (1, 1),
            [(0, 0), (kw // 2, kw // 2)],  # H: VALID (halo provides context)
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.astype(xl.dtype)

    shard = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, spatial_axis, None, None), P(), P()),
        out_specs=P(None, spatial_axis, None, None),
    )
    return shard(local)(x, kernel, bias)
