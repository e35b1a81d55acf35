"""Fused ConvLSTM cell — whole-level Pallas TPU kernel (inference).

Reference parity: the ConvLSTM2D recurrence of Networks.py::DownBlock2D
(SURVEY.md §3.3) — numerics identical to ops/convlstm.py's XLA path, which
remains the correctness oracle and the fallback everywhere this kernel's
constraints don't hold.

Why this exists (v5e HLO/trace analysis, BASELINE.md round 2): at level 0
(512², F=128, 4F=512) XLA materializes the gate tensor in HBM and surrounds
the gate convs with blocked-layout copies and f32 gate-update intermediates
— ~1 GB/frame of pure data movement. r1's gate-update-only Pallas kernel
LOST 3× because pallas_call was a fusion barrier *downstream of the conv*;
the fix is to fuse the conv itself: this kernel computes the 5×5 recurrent
conv as 25 shifted MXU matmuls accumulated in a VMEM f32 scratch, applies
the gate math, and writes only h_new/c_new — the 4F gates never leave VMEM.

Split of labor (same as the split-gate-conv lesson): the x-conv
(Cin=in_channels, tiny FLOPs) + bias stays an XLA conv fused upstream; its
output ``gx`` [H,W,4F] is this kernel's additive input.

Constraints (checked by ``supported``): single-sample [H,W,*] operands,
F % 128 == 0, W % 128 == 0, H % ROWS == 0, 5x5 kernel. Everything else
falls back to XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 4  # rows of output computed per grid program (ROWS+4 = 8 keeps the
          # halo DMA slice length a whole number of 8-sublane tiles)

# Test hook (mirrors lstm_gates.FORCE_INTERPRET)
FORCE_INTERPRET = False


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(h: int, w: int, feat: int, kh: int, kw: int, batch: int) -> bool:
    if not (batch == 1 and kh == 5 and kw == 5 and feat % 128 == 0
            and w % 128 == 0 and h % ROWS == 0):
        return False
    # VMEM budget: gate accumulator + resident Wh dominate. Levels with
    # F > 128 blow the budget (e.g. F=256: 13 MB of Wh + 8 MB acc) — in
    # practice this kernel serves level 0, where the copies live anyway.
    acc = ROWS * w * 4 * feat * 4
    wh = kh * kw * feat * 4 * feat * 2
    return acc + wh <= 12 * 2 ** 20


def _recurrent_act(x, kind: str):
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind == "hard_sigmoid":
        return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)
    raise ValueError(f"unknown recurrent activation {kind!r}")


def _kernel(recurrent_activation,
            h_pad_ref, gx_ref, c_ref, wh_ref,
            h_out_ref, c_out_ref,
            h_tile, acc, sem):
    """One grid program: ROWS output rows across the full width.

    h_pad_ref: [H+4, W+4, F] in ANY (DMA'd with halo), gx_ref: [ROWS, W, 4F]
    blocked, c_ref: [ROWS, W, F] blocked, wh_ref: [5, 5, F, 4F] VMEM.
    """
    i = pl.program_id(0)
    w = gx_ref.shape[1]
    wp = h_tile.shape[1]  # W padded to a sublane-aligned width (W + 8)
    feat = c_ref.shape[-1]

    # halo'd input rows for this tile: [ROWS+4, WP, F]. The DMA must copy
    # full (tile-aligned) rows: Mosaic rejects HBM slices whose sublane dim
    # is not a multiple of 8 (hence the W+8 pad, not W+4).
    dma = pltpu.make_async_copy(
        h_pad_ref.at[pl.ds(i * ROWS, ROWS + 4)], h_tile, sem)
    dma.start()
    dma.wait()

    # 5x5 recurrent conv as 25 shifted matmuls, f32 accumulation in VMEM.
    # Column shifts via roll + aligned [:w] slice — a direct dx:dx+w slice
    # is sublane-unaligned for dx∉{0,8,...} and Mosaic rejects it; rolls on
    # sub-32-bit data are unimplemented (tpu.rotate), so the shift runs in
    # f32 and converts back to the matmul dtype (5 round-trips per block,
    # not 25: dx is the outer loop, the row tap dy slices the leading dim,
    # which allows any offset). The rolled-in wrap columns land at index
    # >= wp-dx > w, outside the kept region.
    dot_dt = h_tile.dtype
    first = True
    for dx in range(5):
        t32 = h_tile[:].astype(jnp.float32)
        sh = t32 if dx == 0 else pltpu.roll(t32, wp - dx, axis=1)
        cols = sh[:, :w, :].astype(dot_dt)
        for dy in range(5):
            xs = cols[dy:dy + ROWS].reshape(ROWS * w, feat)
            tap = jnp.dot(xs, wh_ref[dy, dx],
                          preferred_element_type=jnp.float32)
            if first:
                acc[:] = tap
                first = False
            else:
                acc[:] += tap

    gates = acc[:] + gx_ref[:].reshape(ROWS * w, 4 * feat).astype(jnp.float32)
    i_g = _recurrent_act(gates[:, 0 * feat:1 * feat], recurrent_activation)
    f_g = _recurrent_act(gates[:, 1 * feat:2 * feat], recurrent_activation)
    cand = jnp.tanh(gates[:, 2 * feat:3 * feat])
    o_g = _recurrent_act(gates[:, 3 * feat:4 * feat], recurrent_activation)
    c_new = f_g * c_ref[:].reshape(ROWS * w, feat).astype(jnp.float32) + i_g * cand
    c_out_ref[:] = c_new.reshape(ROWS, w, feat).astype(c_out_ref.dtype)
    h_out_ref[:] = (o_g * jnp.tanh(c_new)).reshape(ROWS, w, feat).astype(
        h_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("recurrent_activation",))
def fused_convlstm_level(gx: jax.Array, h: jax.Array, c: jax.Array,
                         wh: jax.Array,
                         recurrent_activation: str = "sigmoid"
                         ) -> Tuple[jax.Array, jax.Array]:
    """(gx [H,W,4F], h [H,W,F], c [H,W,F], wh [5,5,F,4F]) -> (c_new, h_new).

    ``gx`` = conv(x, Wx) + bias computed by XLA. Zero-padding h here matches
    the XLA conv's SAME geometry.
    """
    hh, ww, feat = h.shape
    # right-pad the column halo to 6 so the padded width (ww + 8) stays a
    # multiple of the 8-sublane tile — see the DMA note in _kernel
    h_pad = jnp.pad(h.astype(wh.dtype), ((2, 2), (2, 6), (0, 0)))
    grid = (hh // ROWS,)
    kern = functools.partial(_kernel, recurrent_activation)
    h_new, c_new = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # h_pad: manual halo DMA
            pl.BlockSpec((ROWS, ww, 4 * feat), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ww, feat), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wh resident
        ],
        out_specs=(
            pl.BlockSpec((ROWS, ww, feat), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, ww, feat), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hh, ww, feat), h.dtype),   # h_new
            jax.ShapeDtypeStruct((hh, ww, feat), c.dtype),   # c_new
        ),
        scratch_shapes=[
            pltpu.VMEM((ROWS + 4, ww + 8, feat), wh.dtype),  # halo tile
            pltpu.VMEM((ROWS * ww, 4 * feat), jnp.float32),  # gate accum
            pltpu.SemaphoreType.DMA(()),
        ],
        # the f32 roll round-trip temporaries push the stack just past the
        # default 16 MB scoped-vmem limit at F=128/W=512 (measured 16.16 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 2 ** 20),
        interpret=_use_interpret(),
    )(h_pad, gx, c, wh)
    return h_new, c_new
