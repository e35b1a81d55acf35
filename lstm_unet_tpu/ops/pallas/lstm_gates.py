"""Fused ConvLSTM gate update — Pallas TPU kernel.

Reference parity: the gate math of Keras ``ConvLSTM2D`` (SURVEY.md §3.3:
"gates: one conv over [x,h] → 4F ch → σ,σ,tanh,σ → c,h"). The gate
*convolution* itself stays an XLA `conv_general_dilated` (it lowers onto the
MXU optimally); this kernel fuses everything downstream of it — the four
activations and the cell/hidden state update — into one VMEM-resident pass,
eliminating five HBM round-trips of intermediates (i, f, g, o, tanh(c)) that
an unfused implementation would materialize:

    i = act_r(gates[..., 0F:1F])     # input gate
    f = act_r(gates[..., 1F:2F])     # forget gate
    g = tanh (gates[..., 2F:3F])     # candidate
    o = act_r(gates[..., 3F:4F])     # output gate
    c_new = f * c + i * g
    h_new = o * tanh(c_new)

Gate order (i, f, g/candidate, o) matches Keras ConvLSTM2D's (i, f, c, o).
``act_r`` is sigmoid by default; ``hard_sigmoid`` reproduces Keras-2.0-era
defaults (clip(0.2x + 0.5, 0, 1)).

Backward pass: the op carries a custom VJP whose backward is a second fused
Pallas kernel (same memory-locality argument applies to BPTT training).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 256  # rows of the flattened (B*H*W, F) view handled per program

# Test hook: force the Pallas kernel to run in interpret mode on non-TPU
# backends instead of dispatching to the XLA twin (see fused_lstm_gate_update).
FORCE_INTERPRET = False


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_block(n_rows: int) -> int:
    return min(_ROW_BLOCK, max(8, n_rows))


def _recurrent_act(x, kind: str):
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind == "hard_sigmoid":
        return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)
    raise ValueError(f"unknown recurrent activation {kind!r}")


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(recurrent_activation, gates_ref, c_ref, c_out_ref, h_out_ref):
    f32 = jnp.float32
    feat = c_ref.shape[-1]
    g = gates_ref[...].astype(f32)
    i = _recurrent_act(g[..., 0 * feat: 1 * feat], recurrent_activation)
    f = _recurrent_act(g[..., 1 * feat: 2 * feat], recurrent_activation)
    cand = jnp.tanh(g[..., 2 * feat: 3 * feat])
    o = _recurrent_act(g[..., 3 * feat: 4 * feat], recurrent_activation)
    c_new = f * c_ref[...].astype(f32) + i * cand
    c_out_ref[...] = c_new.astype(c_out_ref.dtype)
    h_out_ref[...] = (o * jnp.tanh(c_new)).astype(h_out_ref.dtype)


def _fwd_pallas(gates2d: jax.Array, c2d: jax.Array, recurrent_activation: str):
    rows, feat = c2d.shape
    blk = _row_block(rows)
    grid = (pl.cdiv(rows, blk),)
    kernel = functools.partial(_fwd_kernel, recurrent_activation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, 4 * feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, feat), c2d.dtype),
            jax.ShapeDtypeStruct((rows, feat), c2d.dtype),
        ),
        interpret=_use_interpret(),
    )(gates2d, c2d)


# --------------------------------------------------------------------------
# Backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(recurrent_activation, gates_ref, c_ref, dc_out_ref, dh_ref,
                dgates_ref, dc_ref):
    f32 = jnp.float32
    feat = c_ref.shape[-1]
    g = gates_ref[...].astype(f32)
    zi = g[..., 0 * feat: 1 * feat]
    zf = g[..., 1 * feat: 2 * feat]
    zg = g[..., 2 * feat: 3 * feat]
    zo = g[..., 3 * feat: 4 * feat]
    i = _recurrent_act(zi, recurrent_activation)
    f = _recurrent_act(zf, recurrent_activation)
    cand = jnp.tanh(zg)
    o = _recurrent_act(zo, recurrent_activation)
    c_prev = c_ref[...].astype(f32)
    c_new = f * c_prev + i * cand
    tc = jnp.tanh(c_new)

    dh = dh_ref[...].astype(f32)
    dc_out = dc_out_ref[...].astype(f32)
    dc_new = dc_out + dh * o * (1.0 - tc * tc)

    if recurrent_activation == "sigmoid":
        d_zi = dc_new * cand * i * (1.0 - i)
        d_zf = dc_new * c_prev * f * (1.0 - f)
        d_zo = dh * tc * o * (1.0 - o)
    else:  # hard_sigmoid: derivative 0.2 inside the linear band, 0 outside
        d_zi = dc_new * cand * jnp.where((zi > -2.5) & (zi < 2.5), 0.2, 0.0)
        d_zf = dc_new * c_prev * jnp.where((zf > -2.5) & (zf < 2.5), 0.2, 0.0)
        d_zo = dh * tc * jnp.where((zo > -2.5) & (zo < 2.5), 0.2, 0.0)
    d_zg = dc_new * i * (1.0 - cand * cand)

    dgates_ref[...] = jnp.concatenate([d_zi, d_zf, d_zg, d_zo], axis=-1).astype(
        dgates_ref.dtype)
    dc_ref[...] = (dc_new * f).astype(dc_ref.dtype)


def _bwd_pallas(gates2d, c2d, dc_out2d, dh2d, recurrent_activation: str):
    rows, feat = c2d.shape
    blk = _row_block(rows)
    grid = (pl.cdiv(rows, blk),)
    kernel = functools.partial(_bwd_kernel, recurrent_activation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, 4 * feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, 4 * feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, feat), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 4 * feat), gates2d.dtype),
            jax.ShapeDtypeStruct((rows, feat), c2d.dtype),
        ),
        interpret=_use_interpret(),
    )(gates2d, c2d, dc_out2d, dh2d)


# --------------------------------------------------------------------------
# Public op (custom VJP) + XLA reference implementation
# --------------------------------------------------------------------------


def lstm_gate_update_xla(gates: jax.Array, c: jax.Array,
                         recurrent_activation: str = "sigmoid"):
    """XLA-composite twin — the correctness oracle (SURVEY.md §7 step 3).

    Gate math runs in f32, but the upcast happens per-slice AFTER the gate
    tensor is read: casting the whole tensor first fuses the convert into
    the producing conv and materializes the 4F gates in f32 — doubling the
    dominant HBM buffer's traffic under bf16 compute (seen in the step HLO:
    f32 gate buffers at level 0).
    """
    feat = c.shape[-1]

    def g32(k):
        return gates[..., k * feat: (k + 1) * feat].astype(jnp.float32)

    i = _recurrent_act(g32(0), recurrent_activation)
    f = _recurrent_act(g32(1), recurrent_activation)
    cand = jnp.tanh(g32(2))
    o = _recurrent_act(g32(3), recurrent_activation)
    c_new = f * c.astype(jnp.float32) + i * cand
    h_new = o * jnp.tanh(c_new)
    return c_new.astype(c.dtype), h_new.astype(c.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_lstm_gate_update(gates: jax.Array, c: jax.Array,
                           recurrent_activation: str = "sigmoid"
                           ) -> Tuple[jax.Array, jax.Array]:
    """Fused (c_new, h_new) from pre-activation gates [..., 4F] and c [..., F].

    On non-TPU backends the XLA twin runs instead (interpret-mode Pallas is a
    debugging tool, far too slow for CPU CI training loops); set
    ``FORCE_INTERPRET=True`` to exercise the real kernel via the interpreter
    (parity tests do).
    """
    if _use_interpret() and not FORCE_INTERPRET:
        return lstm_gate_update_xla(gates, c, recurrent_activation)
    shape = c.shape
    feat = shape[-1]
    c2, h2 = _fwd_pallas(gates.reshape(-1, 4 * feat), c.reshape(-1, feat),
                         recurrent_activation)
    return c2.reshape(shape), h2.reshape(shape)


def _fwd_rule(gates, c, recurrent_activation):
    out = fused_lstm_gate_update(gates, c, recurrent_activation)
    return out, (gates, c)


def _bwd_rule(recurrent_activation, res, cotangents):
    gates, c = res
    dc_out, dh = cotangents
    if _use_interpret() and not FORCE_INTERPRET:
        _, vjp = jax.vjp(
            lambda g, cc: lstm_gate_update_xla(g, cc, recurrent_activation), gates, c)
        return vjp((dc_out, dh))
    shape = c.shape
    feat = shape[-1]
    dgates, dc = _bwd_pallas(
        gates.reshape(-1, 4 * feat), c.reshape(-1, feat),
        dc_out.reshape(-1, feat), dh.reshape(-1, feat), recurrent_activation)
    return dgates.reshape(gates.shape), dc.reshape(shape)


fused_lstm_gate_update.defvjp(_fwd_rule, _bwd_rule)
