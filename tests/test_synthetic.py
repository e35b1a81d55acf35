"""Synthetic generator tests — protocol-v4 occlusion-hardness knobs.

The v4 knobs (overlap_gap / overlap_match_intensity / overlap_rel_velocity)
must each do what the heldout_protocol.py v4 sequences rely on, and must be
rng-gated so historical (seed, overlap_frac) draws stay bit-identical
(test_golden.py locks the knobs-off stream end-to-end).
"""

import numpy as np

from lstm_unet_tpu.io.synthetic import make_cell_sequence


def _contact_len(lab):
    """Count 4-adjacent pixel pairs with two DIFFERENT nonzero labels."""
    a, b = lab[:, :-1], lab[:, 1:]
    h = np.sum((a != b) & (a > 0) & (b > 0))
    a, b = lab[:-1, :], lab[1:, :]
    v = np.sum((a != b) & (a > 0) & (b > 0))
    return int(h + v)


def test_v4_defaults_bit_identical_to_historical():
    base = make_cell_sequence(num_frames=4, height=48, width=48, num_cells=5,
                              seed=7, overlap_frac=0.5)
    explicit = make_cell_sequence(num_frames=4, height=48, width=48,
                                  num_cells=5, seed=7, overlap_frac=0.5,
                                  overlap_gap=(0.55, 1.05),
                                  overlap_match_intensity=False,
                                  overlap_rel_velocity=0.0)
    np.testing.assert_array_equal(base[0], explicit[0])
    np.testing.assert_array_equal(base[1], explicit[1])


def test_match_intensity_removes_brightness_step():
    """With intensity matching, the two cells of a forced pair peak at the
    same brightness — the occlusion edge has no intensity cue."""
    imgs, labs = make_cell_sequence(
        num_frames=1, height=64, width=64, num_cells=2, seed=3, noise=0.0,
        overlap_frac=0.5, overlap_gap=(0.5, 0.6),
        overlap_match_intensity=True)
    lab, img = labs[0], imgs[0].astype(np.float64)
    assert set(np.unique(lab)) == {0, 1, 2}
    p1 = img[lab == 1].max()
    p2 = img[lab == 2].max()
    # same inten ⇒ same exp(-d) peak up to uint16 quantization (the
    # occluded anchor may lose its exact center pixel — allow 2%)
    assert abs(p1 - p2) / max(p1, p2) < 0.02

    # control: without matching, seed 3's pair peaks differ measurably
    imgs0, labs0 = make_cell_sequence(
        num_frames=1, height=64, width=64, num_cells=2, seed=3, noise=0.0,
        overlap_frac=0.5, overlap_gap=(0.5, 0.6))
    q1 = imgs0[0][labs0[0] == 1].max()
    q2 = imgs0[0][labs0[0] == 2].max()
    assert abs(float(q1) - float(q2)) / max(q1, q2) > 0.05


def test_deep_overlap_gap_forces_contact():
    _, labs = make_cell_sequence(
        num_frames=1, height=64, width=64, num_cells=2, seed=1, noise=0.0,
        overlap_frac=0.5, overlap_gap=(0.45, 0.55))
    assert _contact_len(labs[0]) > 0


def test_rel_velocity_makes_contacts_dynamic():
    """With relative drift the pair's contact length changes over the
    sequence; with velocity copied (default) it stays ~constant."""
    kw = dict(num_frames=12, height=96, width=96, num_cells=2, seed=2,
              noise=0.0, overlap_frac=0.5, overlap_gap=(0.5, 0.7))
    _, labs_dyn = make_cell_sequence(overlap_rel_velocity=0.8, **kw)
    _, labs_st = make_cell_sequence(**kw)
    dyn = [_contact_len(l) for l in labs_dyn]
    st = [_contact_len(l) for l in labs_st]
    assert max(st) - min(st) <= 2, st  # copied velocity: contact persists
    assert max(dyn) - min(dyn) > 5, dyn  # relative drift: forms/breaks
