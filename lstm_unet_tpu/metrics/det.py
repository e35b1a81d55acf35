"""CTC DET measure (detection half of the official evaluation pair).

Reference parity: the reference relies on the CTC organizers' closed-source
evaluation executable for official scores (SURVEY.md §4), which reports both
SEG and DET on every submission. `metrics/seg.py` covers SEG; this module
implements the published DET definition (Matula et al. 2015, "Cell tracking
accuracy measurement based on comparison of acyclic oriented graphs",
AOGM-D restricted to node operations) so a reference user gets the complete
CTC score pair hermetically.

Definition. Detection is scored as the cost of editing the computed set of
markers into the reference set, using the cheapest node operations:

- NS (split): a computed marker matched by k>1 reference markers needs k-1
  splits — weight 5;
- FN (false negative): an unmatched reference marker must be added —
  weight 10;
- FP (false positive): a computed marker matched by no reference marker
  must be deleted — weight 1.

Matching uses the same strict-majority rule as SEG: reference marker R
matches computed marker S iff |R ∩ S| > 0.5·|R| (at most one such S exists;
one S may be matched by several R). With AOGM-D = 5·NS + 10·FN + 1·FP and
AOGM-D0 = 10·N_ref (building the reference detection from scratch),

    DET = 1 − min(AOGM-D, AOGM-D0) / AOGM-D0.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

W_NS = 5.0
W_FN = 10.0
W_FP = 1.0


def det_counts(gt: np.ndarray, pred: np.ndarray) -> Tuple[int, int, int, int]:
    """Detection edit counts over one frame.

    Returns (ns, fn, fp, n_gt): split/add/delete operation counts and the
    number of reference markers (AOGM-D0 contribution).
    """
    gt = np.asarray(gt)
    pred = np.asarray(pred)
    if gt.shape != pred.shape:
        raise ValueError(f"shape mismatch {gt.shape} vs {pred.shape}")
    # densify labels (rank-index) so sparse/large CTC ids never blow the
    # histogram up — same construction as seg_measure, so SEG and DET share
    # matching semantics exactly
    gt_ids, gt_d = np.unique(gt, return_inverse=True)
    if gt_ids[0] != 0:
        gt_ids = np.concatenate([[0], gt_ids])
        gt_d = gt_d + 1
    pred_ids, pred_d = np.unique(pred, return_inverse=True)
    if pred_ids[0] != 0:
        pred_ids = np.concatenate([[0], pred_ids])
        pred_d = pred_d + 1
    n_gt = int(gt_ids.size - 1)
    n_pred = int(pred_ids.size - 1)
    if n_gt == 0:
        return 0, 0, n_pred, 0
    if n_pred == 0:
        return 0, n_gt, 0, n_gt
    joint = np.zeros((gt_ids.size, pred_ids.size), np.int64)
    np.add.at(joint, (gt_d.ravel(), pred_d.ravel()), 1)
    gt_sizes = joint.sum(axis=1)

    matches_per_pred = np.zeros(pred_ids.size, np.int64)
    fn = 0
    for g in range(1, gt_ids.size):
        inter = joint[g, 1:]
        best = int(np.argmax(inter)) + 1
        if int(inter[best - 1]) * 2 > gt_sizes[g]:
            matches_per_pred[best] += 1
        else:
            fn += 1
    matched = matches_per_pred[1:]
    fp = int(np.count_nonzero(matched == 0))
    ns = int(np.maximum(matched - 1, 0).sum())
    return ns, fn, fp, n_gt


def det_measure_sequence(gt_frames: Iterable[np.ndarray],
                         pred_frames: Iterable[np.ndarray]) -> float:
    """DET over a sequence (the CTC dataset score)."""
    ns = fn = fp = n_ref = 0
    for gt, pred in zip(gt_frames, pred_frames):
        s, n, p, g = det_counts(gt, pred)
        ns += s
        fn += n
        fp += p
        n_ref += g
    if n_ref == 0:
        return 0.0
    aogm_d = W_NS * ns + W_FN * fn + W_FP * fp
    aogm_d0 = W_FN * n_ref
    return 1.0 - min(aogm_d, aogm_d0) / aogm_d0
