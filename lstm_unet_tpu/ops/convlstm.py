"""ConvLSTM2D cell — TPU-native.

Reference parity: Keras ``ConvLSTM2D`` as used per encoder level in
``Networks.py::DownBlock2D`` (SURVEY.md §2, §3.3). Semantics reproduced:

- gate pre-activations = conv(x, Wx) + conv(h, Wh) + b over 4F channels —
  the same separate input/recurrent kernels Keras uses. (Separate convs are
  also the right MXU shape: a fused conv over concat([x, h]) has
  Cin = in_channels + F, which at the first level is 1+F — one lane past a
  tile boundary, so the MXU pads the reduction dim to the next multiple of
  128 and nearly doubles the dominant conv's cost; the split h-conv keeps
  Cin = F, perfectly tiled, and skips materializing the concat buffer.)
- gate order (i, f, candidate, o), unit forget-gate bias init,
- recurrent_activation 'sigmoid' (or 'hard_sigmoid' for Keras-2.0 parity),
- explicit (h, c) carry as a pytree — the reference manages Keras layer
  state via reset_states_per_batch/get_states/set_states (SURVEY.md §2
  "Full model"); here state is a value, which makes truncated BPTT,
  per-lane reset, donation, and sharding trivial.

The post-conv gate math runs in the fused Pallas kernel
(ops/pallas/lstm_gates.py); ``use_pallas=False`` selects the XLA twin.

Init deviation (documented): Keras uses orthogonal init for the recurrent
kernel; we use glorot-uniform for both kernels. Initializer choice is a
training detail, not part of the behavioral contract (SURVEY.md §8).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .conv import conv2d
from .pallas.lstm_gates import fused_lstm_gate_update, lstm_gate_update_xla

Carry = Tuple[jax.Array, jax.Array]  # (h, c), each [B,H,W,F]


class ConvLSTMCell:
    """Functional ConvLSTM cell: params are a dict pytree, state is explicit."""

    @staticmethod
    def init(rng: jax.Array, kernel_size: int, in_channels: int, filters: int,
             dtype=jnp.float32) -> Dict[str, jax.Array]:
        kh = kw = kernel_size
        cout = 4 * filters
        rx, rh = jax.random.split(rng)
        lim_x = math.sqrt(6.0 / (kh * kw * in_channels + kh * kw * cout))
        lim_h = math.sqrt(6.0 / (kh * kw * filters + kh * kw * cout))
        kernel_x = jax.random.uniform(rx, (kh, kw, in_channels, cout), dtype,
                                      -lim_x, lim_x)
        kernel_h = jax.random.uniform(rh, (kh, kw, filters, cout), dtype,
                                      -lim_h, lim_h)
        # unit forget-gate bias (Keras unit_forget_bias=True)
        bias = jnp.zeros((cout,), dtype).at[filters: 2 * filters].set(1.0)
        return {"kernel_x": kernel_x, "kernel_h": kernel_h, "bias": bias}

    @staticmethod
    def init_state(batch: int, height: int, width: int, filters: int,
                   dtype=jnp.float32) -> Carry:
        shape = (batch, height, width, filters)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    @staticmethod
    def apply(params: Dict[str, jax.Array], carry: Carry, x: jax.Array, *,
              recurrent_activation: str = "sigmoid",
              use_pallas: bool = True,
              fused_cell: bool = False) -> Tuple[Carry, jax.Array]:
        """One timestep: ((h,c), x[B,H,W,Cin]) -> ((h',c'), h').

        ``fused_cell=True`` routes through the whole-level Pallas kernel
        (ops/pallas/convlstm_cell.py) when its shape/VMEM constraints hold:
        the recurrent conv + gate math run VMEM-resident, so the 4F gate
        tensor and its blocked-layout copies never hit HBM.
        """
        h, c = carry
        if fused_cell:
            from .pallas.convlstm_cell import fused_convlstm_level, supported

            quantized = "kernel_x_q" in params
            kh_, kw_, feat = (params["kernel_h_q"].shape[:2] + (c.shape[-1],)
                              if quantized else
                              params["kernel_h"].shape[:2] + (c.shape[-1],))
            if supported(x.shape[1], x.shape[2], feat, kh_, kw_, x.shape[0]):
                if quantized:
                    from .quant import conv2d_q

                    gx_q = {"kernel_q": params["kernel_x_q"],
                            "w_scale": params["wx_scale"],
                            "bias": params["bias"]}
                    if "x_scale" in params:
                        gx_q["x_scale"] = params["x_scale"]
                    gx = conv2d_q(x, gx_q, out_dtype=x.dtype)
                    wh = (params["kernel_h_q"].astype(x.dtype)
                          * params["wh_scale"].astype(x.dtype))
                else:
                    gx = conv2d(x, params["kernel_x"], params["bias"])
                    wh = params["kernel_h"].astype(x.dtype)
                h_new, c_new = fused_convlstm_level(
                    gx[0], h[0], c[0], wh,
                    recurrent_activation=recurrent_activation)
                return (h_new[None], c_new[None]), h_new[None]
        if "kernel_x_q" in params:  # int8-quantized cell (ops/quant.py)
            from .quant import conv2d_q

            # gate pre-activations in the compute dtype (bf16): f32 gate
            # outputs at 4F channels cost ~1 GB/step of blocked-layout
            # copies on v5e (int8 HLO analysis, BASELINE.md); the bf16
            # baseline computes gates in bf16 too, so this loses nothing
            qx = {"kernel_q": params["kernel_x_q"],
                  "w_scale": params["wx_scale"], "bias": params["bias"]}
            qh = {"kernel_q": params["kernel_h_q"],
                  "w_scale": params["wh_scale"]}
            if "x_scale" in params:
                qx["x_scale"] = params["x_scale"]
            if "h_scale" in params:
                qh["x_scale"] = params["h_scale"]
            gates = (conv2d_q(x, qx, out_dtype=x.dtype)
                     + conv2d_q(h, qh, out_dtype=x.dtype))
        else:
            gates = (conv2d(x, params["kernel_x"], params["bias"])
                     + conv2d(h.astype(x.dtype), params["kernel_h"]))
        update = fused_lstm_gate_update if use_pallas else lstm_gate_update_xla
        c_new, h_new = update(gates, c, recurrent_activation)
        return (h_new, c_new), h_new
