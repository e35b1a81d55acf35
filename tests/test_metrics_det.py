"""CTC DET measure (metrics/det.py) — hand-computed AOGM-D cases.

DET = 1 − min(5·NS + 10·FN + 1·FP, 10·N_ref) / (10·N_ref), matching via the
same strict-majority overlap rule as SEG (Matula et al. 2015; see module
docstring for the derivation).
"""

import numpy as np
import pytest

from lstm_unet_tpu.metrics import det_counts, det_measure_sequence


def _frame(*boxes, shape=(16, 16)):
    a = np.zeros(shape, np.int32)
    for label, (r0, r1, c0, c1) in boxes:
        a[r0:r1, c0:c1] = label
    return a


def test_perfect_detection():
    gt = _frame((1, (0, 4, 0, 4)), (2, (8, 12, 8, 12)))
    pred = _frame((5, (0, 4, 0, 4)), (9, (8, 12, 8, 12)))  # labels differ — fine
    assert det_counts(gt, pred) == (0, 0, 0, 2)
    assert det_measure_sequence([gt], [pred]) == pytest.approx(1.0)


def test_false_negative():
    gt = _frame((1, (0, 4, 0, 4)), (2, (8, 12, 8, 12)))
    pred = _frame((1, (0, 4, 0, 4)))
    ns, fn, fp, n = det_counts(gt, pred)
    assert (ns, fn, fp, n) == (0, 1, 0, 2)
    # AOGM-D = 10, D0 = 20
    assert det_measure_sequence([gt], [pred]) == pytest.approx(0.5)


def test_false_positive():
    gt = _frame((1, (0, 4, 0, 4)))
    pred = _frame((1, (0, 4, 0, 4)), (2, (8, 12, 8, 12)))
    ns, fn, fp, n = det_counts(gt, pred)
    assert (ns, fn, fp, n) == (0, 0, 1, 1)
    # AOGM-D = 1, D0 = 10
    assert det_measure_sequence([gt], [pred]) == pytest.approx(0.9)


def test_split_one_pred_covers_two_gt():
    # one merged prediction fully covers two GT cells → 1 split op
    gt = _frame((1, (0, 4, 0, 4)), (2, (0, 4, 6, 10)))
    pred = _frame((3, (0, 4, 0, 10)))
    ns, fn, fp, n = det_counts(gt, pred)
    assert (ns, fn, fp, n) == (1, 0, 0, 2)
    # AOGM-D = 5, D0 = 20
    assert det_measure_sequence([gt], [pred]) == pytest.approx(0.75)


def test_majority_rule_is_strict():
    gt = _frame((1, (0, 4, 0, 4)))          # 16 px
    pred = _frame((1, (0, 4, 0, 2)))        # overlap 8 = exactly half → no match
    ns, fn, fp, n = det_counts(gt, pred)
    assert (ns, fn, fp, n) == (0, 1, 1, 1)
    pred = _frame((1, (0, 4, 0, 3)))        # overlap 12 > 8 → match
    assert det_counts(gt, pred) == (0, 0, 0, 1)


def test_empty_prediction_scores_zero():
    gt = _frame((1, (0, 4, 0, 4)))
    assert det_measure_sequence([gt], [np.zeros_like(gt)]) == pytest.approx(0.0)


def test_clamped_at_zero_when_worse_than_rebuild():
    # 1 GT missed (FN=10 = D0) plus spurious FPs pushes AOGM-D past D0;
    # min() clamps DET at exactly 0, never negative
    gt = _frame((1, (0, 4, 0, 4)))
    pred = _frame((1, (8, 12, 0, 4)), (2, (8, 12, 6, 10)))
    assert det_measure_sequence([gt], [pred]) == pytest.approx(0.0)


def test_sequence_accumulates_counts_before_normalizing():
    gt = _frame((1, (0, 4, 0, 4)))
    miss = np.zeros_like(gt)
    # frame 1 perfect, frame 2 missed: AOGM-D = 10, D0 = 20 → 0.5
    assert det_measure_sequence([gt, gt], [gt, miss]) == pytest.approx(0.5)


def test_empty_gt_sequence_scores_zero():
    z = np.zeros((8, 8), np.int32)
    assert det_measure_sequence([z], [z]) == 0.0


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        det_counts(np.zeros((4, 4), np.int32), np.zeros((4, 5), np.int32))
