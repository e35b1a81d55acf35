"""Synthetic CTC-format data generator.

No reference analog (the reference trains on downloaded CTC data); this
exists so tests, golden files, and benchmarks run hermetically in CI without
the Cell Tracking Challenge download. Generates moving elliptical "cells"
with instance labels in the CTC directory layout
(``<root>/<dataset>/<seq>/t*.tif`` + ``<seq>_GT/SEG/man_seg*.tif``).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .tiff import write_tiff


def make_cell_sequence(
    num_frames: int = 12,
    height: int = 64,
    width: int = 64,
    num_cells: int = 4,
    seed: int = 0,
    noise: float = 0.05,
    radius_scale: float = 1.0,
    velocity_scale: float = 1.0,
    overlap_frac: float = 0.0,
    overlap_gap: Tuple[float, float] = (0.55, 1.05),
    overlap_match_intensity: bool = False,
    overlap_rel_velocity: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (images [T,H,W] uint16, labels [T,H,W] uint16) of drifting cells.

    ``radius_scale`` scales cell radii — held-out generalization protocols
    vary it (with seed and num_cells) to build unseen distributions.
    ``velocity_scale`` scales per-frame drift — very long single-sequence
    streams (carry-drift protocol) use a small value so cells stay in frame.
    ``overlap_frac`` places that fraction of cells adjacent to (touching /
    partially occluding) a previously placed cell, moving WITH its anchor so
    the contact persists across frames — the occlusion-heavy regime whose
    faint inter-cell boundaries cap the postprocess oracle (BASELINE.md;
    VERDICT r2 task #8). 0 keeps the draw order bit-identical to r1/r2
    sequences of the same seed.

    Protocol-v4 hardness knobs (VERDICT r3 task #8 — the step-8000 error
    decomposition shows residual merges happen where the brightness cue
    between touching cells vanishes; each knob removes one remaining cue,
    and each is rng-gated so existing (seed, overlap_frac) sequences stay
    bit-identical when left at its default):

    - ``overlap_gap``: (lo, hi) of the center-distance draw in units of
      summed radii; (0.45, 0.95) forces every contact to actually overlap.
    - ``overlap_match_intensity``: occluders copy their anchor's intensity,
      deleting the brightness step at the occlusion edge — the GT label
      boundary is then supported only by shape + temporal history.
    - ``overlap_rel_velocity``: std of extra drift relative to the anchor,
      so contacts FORM and BREAK mid-sequence instead of persisting — the
      recurrent state saw the pair as two cells before they touched, and
      the training signal rewards keeping them apart.
    """
    rng = np.random.default_rng(seed)
    cy = rng.uniform(0.2 * height, 0.8 * height, num_cells)
    cx = rng.uniform(0.2 * width, 0.8 * width, num_cells)
    vy = rng.uniform(-1.0, 1.0, num_cells) * velocity_scale
    vx = rng.uniform(-1.0, 1.0, num_cells) * velocity_scale
    ry = rng.uniform(height * 0.06, height * 0.12, num_cells) * radius_scale
    rx = rng.uniform(width * 0.06, width * 0.12, num_cells) * radius_scale
    inten = rng.uniform(0.5, 1.0, num_cells)
    if overlap_frac > 0:
        # re-place the LAST n_ov cells next to random earlier anchors; extra
        # rng draws happen only in this branch so overlap_frac=0 reproduces
        # historical sequences exactly
        n_ov = min(int(round(num_cells * overlap_frac)), num_cells - 1)
        for c in range(num_cells - n_ov, num_cells):
            j = int(rng.integers(0, c))
            ang = rng.uniform(0.0, 2.0 * np.pi)
            gap = rng.uniform(*overlap_gap)  # <1: overlap, ~1: touching
            cy[c] = np.clip(cy[j] + np.sin(ang) * gap * (ry[j] + ry[c]),
                            0.1 * height, 0.9 * height)
            cx[c] = np.clip(cx[j] + np.cos(ang) * gap * (rx[j] + rx[c]),
                            0.1 * width, 0.9 * width)
            # drift with the anchor: the contact survives the whole sequence
            vy[c], vx[c] = vy[j], vx[j]
            if overlap_match_intensity:
                inten[c] = inten[j]
            if overlap_rel_velocity > 0:
                # extra drift RELATIVE to the anchor — the pair converges /
                # diverges so the contact forms and breaks mid-sequence
                vy[c] += rng.normal(0, overlap_rel_velocity)
                vx[c] += rng.normal(0, overlap_rel_velocity)

    yy, xx = np.mgrid[0:height, 0:width]
    imgs = np.zeros((num_frames, height, width), np.float32)
    labs = np.zeros((num_frames, height, width), np.uint16)
    for t in range(num_frames):
        for c in range(num_cells):
            y, x = cy[c] + vy[c] * t, cx[c] + vx[c] * t
            d = ((yy - y) / ry[c]) ** 2 + ((xx - x) / rx[c]) ** 2
            inside = d <= 1.0
            # later cells overwrite earlier ones where they overlap
            labs[t][inside] = c + 1
            imgs[t][inside] = inten[c] * np.exp(-d[inside])
        imgs[t] += rng.normal(0, noise, (height, width)).astype(np.float32)
    imgs = np.clip(imgs, 0, None)
    imgs_u16 = (imgs / max(imgs.max(), 1e-6) * 60000).astype(np.uint16)
    return imgs_u16, labs


def write_ctc_dataset(
    root: str,
    # "SIM" in the name marks the GT as fully annotated for the reader's
    # full_seg auto-heuristic — synthetic GT covers every cell
    dataset: str = "Synth-N2DH-SIM",
    seq: str = "01",
    annotate_every: int = 1,
    **kwargs,
) -> Tuple[str, str]:
    """Write a synthetic sequence in CTC layout; returns (seq_dir, seg_dir)."""
    imgs, labs = make_cell_sequence(**kwargs)
    seq_dir = os.path.join(root, dataset, seq)
    seg_dir = os.path.join(root, dataset, seq + "_GT", "SEG")
    os.makedirs(seq_dir, exist_ok=True)
    os.makedirs(seg_dir, exist_ok=True)
    for t in range(imgs.shape[0]):
        write_tiff(os.path.join(seq_dir, f"t{t:03d}.tif"), imgs[t])
        if t % annotate_every == 0:
            write_tiff(os.path.join(seg_dir, f"man_seg{t:03d}.tif"), labs[t])
    return seq_dir, seg_dir
