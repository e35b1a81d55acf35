"""Training loss.

Reference parity: pixelwise class-weighted softmax cross-entropy over 3
classes with unlabeled frames masked out of the loss
(SURVEY.md §2 "Loss" [M], §8.3 behavioral contract).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def weighted_ce_loss(
    logits: jax.Array,   # [B,T,H,W,K] float
    labels: jax.Array,   # [B,T,H,W]   int {0..K-1}
    valid: jax.Array,    # [B,T]       float — frame annotated?
    class_weights: Tuple[float, ...],
    full_seg: jax.Array | None = None,  # [B,T] float — frame FULLY annotated?
) -> Tuple[jax.Array, jax.Array]:
    """Returns (scalar loss, scalar pixel accuracy over valid frames).

    ``full_seg`` handles partially-annotated CTC gold truth (reference:
    DataHandeling.py full_seg indicator [M]): on valid-but-partial frames
    only labeled (non-background) pixels contribute — unannotated cells sit
    in the background class and must not be trained as background.
    """
    k = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    w = jnp.asarray(class_weights, jnp.float32)
    per_pixel = -jnp.sum(onehot * logp * w, axis=-1)          # [B,T,H,W]
    mask = jnp.broadcast_to(valid[:, :, None, None].astype(jnp.float32),
                            per_pixel.shape)
    if full_seg is not None:
        fg = (labels > 0).astype(jnp.float32)
        fs = full_seg[:, :, None, None].astype(jnp.float32)
        mask = mask * jnp.maximum(fs, fg)   # partial frames: labeled px only
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(per_pixel * mask) / denom

    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == labels).astype(jnp.float32) * mask) / denom
    return loss, acc
