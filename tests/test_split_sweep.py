"""Offline split-calibration harness (scripts/split_sweep.py).

The harness closes the postprocess calibration loop on saved masks (+ prob
dumps for --method prob); it picked the r3 dead-end verdict for the geometry
splitter, so its scoring/re-splitting must stay correct. Fixture: two true
cells whose prediction merges them, with a p(cell) dip at the contact —
prob mode must recover the split (SEG 0.5 -> 1.0), dist mode must at least
run and never corrupt the baseline bookkeeping.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from lstm_unet_tpu.io.tiff import write_tiff

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sweep_mod():
    spec = importlib.util.spec_from_file_location(
        "split_sweep", os.path.join(HERE, "scripts", "split_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepfix")
    gt_dir = root / "gt" / "Synth-N2DH-SIM" / "01_GT" / "SEG"
    pred_dir = root / "pred" / "Synth-N2DH-SIM" / "01_RES"
    inter = pred_dir / "intermediate"
    for d in (gt_dir, inter):
        d.mkdir(parents=True)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    g1 = 0.95 * np.exp(-(((yy - 48) ** 2 + (xx - 30) ** 2) / (2 * 81)))
    g2 = 0.95 * np.exp(-(((yy - 48) ** 2 + (xx - 62) ** 2) / (2 * 81)))
    p_cell = np.maximum(g1, g2).astype(np.float32)
    interior = p_cell > 0.5
    gt = np.zeros((h, w), np.uint16)
    gt[g1 > 0.5] = 1
    gt[(g2 > 0.5) & (gt == 0)] = 2
    pred = interior.astype(np.uint16)  # merged single instance
    for t in range(2):
        write_tiff(str(gt_dir / f"man_seg{t:03d}.tif"), gt)
        write_tiff(str(pred_dir / f"mask{t:03d}.tif"), pred)
        np.save(str(inter / f"probs{t:03d}.npy"),
                np.stack([1 - p_cell, p_cell, np.zeros_like(p_cell)], -1))
    return root


def _run(sweep_mod, fixture_root, method, capsys):
    argv = sys.argv
    sys.argv = ["split_sweep.py", "--gt_root", str(fixture_root / "gt"),
                "--pred_root", str(fixture_root / "pred"),
                "--method", method]
    try:
        sweep_mod.main()
    finally:
        sys.argv = argv
    return capsys.readouterr().out


def test_prob_mode_recovers_merged_pair(sweep_mod, fixture_root, capsys):
    out = _run(sweep_mod, fixture_root, "prob", capsys)
    assert "baseline mean (seq-avg, CTC convention): 0.5000" in out
    # every no-gate config must fully recover both cells; gated (min_size
    # above the blob) configs must stay exactly at baseline
    for line in out.splitlines():
        parts = line.split()
        if len(parts) == 6 and parts[0].replace(".", "").isdigit():
            mean, _, hi, er, minsz, nsplit = parts
            if int(minsz) == 0:
                assert float(mean) == pytest.approx(1.0), line
                assert int(nsplit) == 2, line
            else:
                assert float(mean) == pytest.approx(0.5), line
                assert int(nsplit) == 0, line


def test_dist_mode_runs_and_reports_baseline(sweep_mod, fixture_root, capsys):
    out = _run(sweep_mod, fixture_root, "dist", capsys)
    assert "baseline mean (seq-avg, CTC convention): 0.5000" in out
    assert "nsplit" in out


def test_seg_measure_matches_package_scorer(sweep_mod):
    """The harness's bincount seg_measure must agree with
    metrics/seg.py::seg_measure (the CLI scorer) on a random labeling."""
    from lstm_unet_tpu.metrics.seg import seg_measure as seg_ref

    rng = np.random.default_rng(0)
    gt = rng.integers(0, 5, (64, 64)).astype(np.uint16)
    pred = rng.integers(0, 5, (64, 64)).astype(np.uint16)
    total, n = sweep_mod.seg_measure(gt, pred)
    ref_total, ref_n = seg_ref(gt, pred)
    assert n == ref_n
    assert total == pytest.approx(ref_total, abs=1e-9)
