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
    # densify labels first: real CTC ids can be large and sparse (uint16
    # man_track labels), and a (gt.max()+1, pred.max()+1) histogram would
    # allocate gigabytes — index by rank instead (0 stays background: rank 0)
    gt_ids, gt_d = np.unique(gt, return_inverse=True)
    if gt_ids[0] != 0:  # no background pixel — prepend a rank for label 0
        gt_ids = np.concatenate([[0], gt_ids])
        gt_d = gt_d + 1
    if gt_ids.size <= 1:
        return 0.0, 0
    pred_ids, pred_d = np.unique(pred, return_inverse=True)
    if pred_ids[0] != 0:
        pred_ids = np.concatenate([[0], pred_ids])
        pred_d = pred_d + 1
    # joint histogram over (gt rank, pred rank)
    joint = np.zeros((gt_ids.size, pred_ids.size), np.int64)
    np.add.at(joint, (gt_d.ravel(), pred_d.ravel()), 1)
    gt_sizes = joint.sum(axis=1)
    pred_sizes = joint.sum(axis=0)
    total = 0.0
    for g in range(1, gt_ids.size):
        inter = joint[g, 1:]  # overlaps with every non-bg pred label
        if inter.size == 0:   # prediction is all background
            continue
        best = int(np.argmax(inter)) + 1
        ovl = int(inter[best - 1])
        if ovl * 2 > gt_sizes[g]:  # strict majority rule of the SEG measure
            union = gt_sizes[g] + pred_sizes[best] - ovl
            total += ovl / union
    return float(total), int(gt_ids.size - 1)


def seg_measure_sequence(gt_frames: Iterable[np.ndarray],
                         pred_frames: Iterable[np.ndarray]) -> float:
    """Mean SEG over all GT objects of a sequence (the CTC dataset score)."""
    total, count = 0.0, 0
    for gt, pred in zip(gt_frames, pred_frames):
        t, c = seg_measure(gt, pred)
        total += t
        count += c
    return total / count if count else 0.0
