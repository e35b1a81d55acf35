"""CTC SEG measure (self-implemented scorer).

Reference parity: the reference repo tracks an approximate SEG measure during
validation (SURVEY.md §2 "Validation metric" [L]) and relies on the CTC
organizers' closed-source evaluation executable for official scores
(SURVEY.md §4). This module implements the published SEG definition so the
build can demonstrate score parity hermetically (SURVEY.md §6):

For every ground-truth object R, find the segmented object S with
|R ∩ S| > 0.5 · |R| (at most one exists). SEG(R) = |R ∩ S| / |R ∪ S| if such
S exists, else 0. The dataset score is the mean over all GT objects.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import numpy as np


def seg_measure(gt: np.ndarray, pred: np.ndarray) -> Tuple[float, int]:
    """SEG over one frame. Returns (sum of per-object Jaccards, #GT objects)."""
    gt = np.asarray(gt)
    pred = np.asarray(pred)
    if gt.shape != pred.shape:
        raise ValueError(f"shape mismatch {gt.shape} vs {pred.shape}")
    gt_ids = np.unique(gt)
    gt_ids = gt_ids[gt_ids > 0]
    if gt_ids.size == 0:
        return 0.0, 0
    # joint histogram over (gt label, pred label)
    n_g = int(gt.max()) + 1
    n_p = int(pred.max()) + 1
    joint = np.zeros((n_g, n_p), np.int64)
    np.add.at(joint, (gt.ravel(), pred.ravel()), 1)
    gt_sizes = joint.sum(axis=1)
    pred_sizes = joint.sum(axis=0)
    total = 0.0
    for g in gt_ids:
        inter = joint[g, 1:]  # overlaps with every non-bg pred label
        if inter.size == 0:   # prediction is all background
            continue
        best = int(np.argmax(inter)) + 1
        ovl = int(inter[best - 1])
        if ovl * 2 > gt_sizes[g]:  # strict majority rule of the SEG measure
            union = gt_sizes[g] + pred_sizes[best] - ovl
            total += ovl / union
    return float(total), int(gt_ids.size)


def seg_measure_sequence(gt_frames: Iterable[np.ndarray],
                         pred_frames: Iterable[np.ndarray]) -> float:
    """Mean SEG over all GT objects of a sequence (the CTC dataset score)."""
    total, count = 0.0, 0
    for gt, pred in zip(gt_frames, pred_frames):
        t, c = seg_measure(gt, pred)
        total += t
        count += c
    return total / count if count else 0.0
