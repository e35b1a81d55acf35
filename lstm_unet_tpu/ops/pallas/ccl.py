"""Connected-component labeling — Pallas TPU kernel.

SURVEY.md §7 hard-part #1. Same algorithm as ops/ccl.py's XLA twin
(synchronous min-label propagation over the 8-neighborhood, seeds = linear
index + 1, fixed point = raster-first label per component), but the whole
label grid lives in VMEM for the entire iteration: one [H, W] int32 grid at
512² is 1 MB — far under the ~16 MB VMEM budget — so every propagation round
is pure VPU work with zero HBM traffic, where the XLA while_loop re-reads and
re-writes the grid from HBM every round.

The row-neighborhood min is computed once per round as a [H, W] three-row
min (shift up/down via pltpu.roll + edge masking), then the column dimension
is handled the same way — 6 rolls total per round versus 8 padded
dynamic-slices in the XLA twin.

Non-TPU backends dispatch to the XLA twin (interpret mode is only for
parity tests, via FORCE_INTERPRET in lstm_gates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lstm_gates as _lg

_INF = jnp.iinfo(jnp.int32).max


def _row_ids(h: int, w: int):
    return jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)


def _col_ids(h: int, w: int):
    return jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)


def _neighborhood_min(lbl: jax.Array, h: int, w: int) -> jax.Array:
    """Min over the 3x3 neighborhood using rolls with edge masking."""
    rows = _row_ids(h, w)
    cols = _col_ids(h, w)
    # pltpu.roll requires non-negative shifts; shift by size-1 == shift by -1
    down = jnp.where(rows == 0, _INF, pltpu.roll(lbl, 1, axis=0))        # from y-1
    up = jnp.where(rows == h - 1, _INF, pltpu.roll(lbl, h - 1, axis=0))  # from y+1
    vert = jnp.minimum(lbl, jnp.minimum(up, down))
    right = jnp.where(cols == 0, _INF, pltpu.roll(vert, 1, axis=1))      # from x-1
    left = jnp.where(cols == w - 1, _INF, pltpu.roll(vert, w - 1, axis=1))
    return jnp.minimum(vert, jnp.minimum(left, right))


def _ccl_kernel(sweeps_per_check: int, mask_ref, out_ref):
    h, w = out_ref.shape
    mask = mask_ref[...] != 0
    idx = _row_ids(h, w) * w + _col_ids(h, w) + 1
    lbl0 = jnp.where(mask, idx, _INF)

    def cond(state):
        _, changed, it = state
        # h*w bound covers worst-case geodesics (matches the XLA twin);
        # early exit keeps real masks fast
        return jnp.logical_and(changed, it < h * w)

    def body(state):
        lbl, _, it = state
        new = lbl
        for _ in range(sweeps_per_check):
            new = jnp.where(mask, _neighborhood_min(new, h, w), _INF)
        return new, jnp.any(new != lbl), it + sweeps_per_check

    lbl, _, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.bool_(True), jnp.int32(0)))
    out_ref[...] = jnp.where(mask, lbl, 0)


@functools.partial(jax.jit, static_argnames=("sweeps_per_check",))
def connected_components_pallas(mask: jax.Array,
                                sweeps_per_check: int = 4) -> jax.Array:
    """Label a binary [H,W] mask on-device; 0 = background.

    Produces exactly the labels of ops.ccl.connected_components (8-conn,
    component-min seeds). Dispatches to the XLA twin off-TPU.
    ``sweeps_per_check=4`` and the h*w iteration bound match the XLA twin's
    loop exactly, so both kernels emit identical labels.
    """
    if jax.default_backend() != "tpu" and not _lg.FORCE_INTERPRET:
        from ..ccl import connected_components

        return connected_components(mask, connectivity=8)
    h, w = mask.shape
    kernel = functools.partial(_ccl_kernel, sweeps_per_check)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(mask.astype(jnp.int32))
