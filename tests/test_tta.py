"""Flip test-time augmentation (engine/infer.py `tta`).

Correctness oracle: at a padding-free size (64² with depth multiple 16),
flipping the raw frame commutes with normalization and the interior crop,
so the TTA engine's averaged probs must equal the mean over four
independent no-TTA engines each fed the corresponding pre-flipped frame
stream (probs unflipped before averaging). This checks the variant
stacking order, the per-variant LSTM state isolation, and the unflip
alignment in one property.
"""
import numpy as np
import pytest

import jax

from lstm_unet_tpu.config import CTCInferenceParams, tiny_net_kernel_params
from lstm_unet_tpu.engine.infer import StreamingInferenceEngine
from lstm_unet_tpu.models import ModelConfig, ULSTMnet2D

FLIPS = (
    lambda a: a,
    lambda a: a[::-1],
    lambda a: a[:, ::-1],
    lambda a: a[::-1, ::-1],
)


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.make(tiny_net_kernel_params(), dtype="float32")
    params = ULSTMnet2D.init(jax.random.PRNGKey(11), cfg)
    return params, cfg


def _frames(n=4, size=64, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.normal(0.5, 0.2, (size, size)).astype(np.float32)
            for _ in range(n)]


def test_tta_probs_equal_mean_of_flipped_streams(model):
    params, cfg = model
    ip_kw = dict(save_intermediate=True, min_cell_size=3, dtype="float32")

    tta_eng = StreamingInferenceEngine(
        params, cfg, CTCInferenceParams(tta=True, **ip_kw))
    ref_engs = [StreamingInferenceEngine(
        params, cfg, CTCInferenceParams(**ip_kw)) for _ in FLIPS]

    for frame in _frames():
        _, probs_tta = tta_eng.process_frame(frame)
        ref_probs = []
        for flip, eng in zip(FLIPS, ref_engs):
            _, p = eng.process_frame(np.ascontiguousarray(flip(frame)))
            # unflip the probs back into original orientation
            ref_probs.append(np.asarray(flip(p)))
        mean_ref = np.mean(ref_probs, axis=0)
        np.testing.assert_allclose(probs_tta, mean_ref, rtol=2e-5, atol=2e-6)


def test_tta_masks_shape_and_determinism(model):
    params, cfg = model
    ip = CTCInferenceParams(tta=True, min_cell_size=3, dtype="float32")
    eng = StreamingInferenceEngine(params, cfg, ip)
    frames = _frames(3)
    masks = [eng.process_frame(f)[0] for f in frames]
    assert all(m.shape == (64, 64) and m.dtype == np.int32 for m in masks)

    eng2 = StreamingInferenceEngine(params, cfg, ip)
    masks2 = [eng2.process_frame(f)[0] for f in frames]
    for a, b in zip(masks, masks2):
        np.testing.assert_array_equal(a, b)


D4 = FLIPS + (
    lambda a: a.T if a.ndim == 2 else np.swapaxes(a, 0, 1),
    lambda a: (a.T if a.ndim == 2 else np.swapaxes(a, 0, 1))[::-1],
    lambda a: (a.T if a.ndim == 2 else np.swapaxes(a, 0, 1))[:, ::-1],
    lambda a: (a.T if a.ndim == 2 else np.swapaxes(a, 0, 1))[::-1, ::-1],
)

D4_INV = FLIPS + (
    # inverse of (transpose, then flip) = (unflip, then transpose)
    lambda a: np.swapaxes(a, 0, 1),
    lambda a: np.swapaxes(a[::-1], 0, 1),
    lambda a: np.swapaxes(a[:, ::-1], 0, 1),
    lambda a: np.swapaxes(a[::-1, ::-1], 0, 1),
)


def test_tta_d4_probs_equal_mean_of_transformed_streams(model):
    """Same oracle as the flip test, over the full 8-element dihedral
    group (tta_mode='d4'): averaged probs == mean over eight independent
    no-TTA engines fed each pre-transformed frame stream (probs aligned
    back before averaging)."""
    params, cfg = model
    ip_kw = dict(save_intermediate=True, min_cell_size=3, dtype="float32")

    tta_eng = StreamingInferenceEngine(
        params, cfg, CTCInferenceParams(tta=True, tta_mode="d4", **ip_kw))
    ref_engs = [StreamingInferenceEngine(
        params, cfg, CTCInferenceParams(**ip_kw)) for _ in D4]

    for frame in _frames(3):
        _, probs_tta = tta_eng.process_frame(frame)
        ref_probs = []
        for fwd, inv, eng in zip(D4, D4_INV, ref_engs):
            _, p = eng.process_frame(np.ascontiguousarray(fwd(frame)))
            ref_probs.append(np.asarray(inv(p)))
        mean_ref = np.mean(ref_probs, axis=0)
        np.testing.assert_allclose(probs_tta, mean_ref, rtol=2e-5, atol=2e-6)


def test_tta_d4_nonsquare_pads_square(model):
    """d4 on a rectangular frame pads to a SQUARE before transposing; the
    output mask still comes back at the original (oh, ow)."""
    params, cfg = model
    ip = CTCInferenceParams(tta=True, tta_mode="d4", min_cell_size=3,
                            dtype="float32")
    eng = StreamingInferenceEngine(params, cfg, ip)
    rng = np.random.default_rng(9)
    frame = rng.normal(0.5, 0.2, (64, 48)).astype(np.float32)
    mask, _ = eng.process_frame(frame)
    assert mask.shape == (64, 48)
