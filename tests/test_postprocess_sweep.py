"""Offline postprocess-parameter sweep harness (scripts/postprocess_sweep.py).

The harness re-runs the PRODUCTION ``postprocess_frame`` op on saved
``--save_intermediate`` probability dumps, so its calibration verdicts feed
directly into shipped postprocess defaults. Fixture: two Gaussian cells with
a p(cell) dip at the contact whose 0.5-threshold interiors merge — the
baseline config must reproduce the saved masks bit-for-bit
(--baseline_check), rank itself at delta 0, and the jointly-swept prob-split
config must recover the merged pair (SEG 0.5 -> 1.0).
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
    # import via file location (scripts/ is not a package); split_sweep is a
    # sibling import inside the module, so scripts/ must be on sys.path
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    spec = importlib.util.spec_from_file_location(
        "postprocess_sweep", os.path.join(HERE, "scripts",
                                          "postprocess_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from lstm_unet_tpu.ops.postprocess import postprocess_frame

    root = tmp_path_factory.mktemp("ppsweepfix")
    gt_dir = root / "gt" / "Synth-N2DH-SIM" / "01_GT" / "SEG"
    pred_dir = root / "pred" / "Synth-N2DH-SIM" / "01_RES"
    inter = pred_dir / "intermediate"
    for d in (gt_dir, inter):
        d.mkdir(parents=True)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    g1 = 0.95 * np.exp(-(((yy - 48) ** 2 + (xx - 40) ** 2) / (2 * 81)))
    g2 = 0.95 * np.exp(-(((yy - 48) ** 2 + (xx - 56) ** 2) / (2 * 81)))
    p_cell = np.maximum(g1, g2).astype(np.float32)
    probs = np.stack([1 - p_cell, p_cell, np.zeros_like(p_cell)], -1)
    gt = np.zeros((h, w), np.uint16)
    gt[g1 > 0.5] = 1
    gt[(g2 > 0.5) & (gt == 0)] = 2
    # the saved masks are the PRODUCTION config's own output — the
    # harness's --baseline_check must reproduce them bit-for-bit
    base = np.asarray(postprocess_frame(
        probs, cell_thresh=0.5, edge_thresh=0.3, min_cell_size=50,
        grow_iters=0, fov=0)).astype(np.uint16)
    assert base.max() == 1  # the two interiors merge at 0.5
    for t in range(2):
        write_tiff(str(gt_dir / f"man_seg{t:03d}.tif"), gt)
        write_tiff(str(pred_dir / f"mask{t:03d}.tif"), base)
        np.save(str(inter / f"probs{t:03d}.npy"), probs)
    return root


def _run(sweep_mod, fixture_root, extra, capsys):
    argv = sys.argv
    sys.argv = ["postprocess_sweep.py",
                "--gt_root", str(fixture_root / "gt"),
                "--pred_root", str(fixture_root / "pred"),
                "--min_cell_size", "50"] + extra
    try:
        sweep_mod.main()
    finally:
        sys.argv = argv
    return capsys.readouterr().out


def _rows(out):
    """Parse ranked rows -> [(mean, delta, rest-of-line)]."""
    rows = []
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 3 and parts[1].startswith(("+", "-")):
            try:
                rows.append((float(parts[0]), float(parts[1]),
                             " ".join(parts[2:])))
            except ValueError:
                pass
    return rows


def test_baseline_reproduced_and_ranked_at_zero(sweep_mod, fixture_root,
                                                capsys):
    out = _run(sweep_mod, fixture_root,
               ["--baseline_check", "--cell_grid", "0.5,0.92",
                "--edge_grid", "0.3"], capsys)
    assert "BASELINE MISMATCH" not in out
    assert "saved-mask baseline mean (seq-avg): 0.5000" in out
    rows = _rows(out)
    assert len(rows) == 2
    by_cfg = {r[2].split()[0]: r for r in rows}
    # the production config re-run offline scores exactly the baseline
    assert by_cfg["cell=0.50"][1] == pytest.approx(0.0)
    # thresh 0.92 leaves sub-min_cell_size caps -> everything dropped
    assert by_cfg["cell=0.92"][0] == pytest.approx(0.0)


def test_joint_prob_split_recovers_merged_pair(sweep_mod, fixture_root,
                                               capsys):
    out = _run(sweep_mod, fixture_root,
               ["--cell_grid", "0.5", "--edge_grid", "0.3",
                "--split_hi_grid", "0.8"], capsys)
    rows = _rows(out)
    assert len(rows) == 1
    mean, delta, cfg = rows[0]
    assert "split(hi=0.8" in cfg
    # the merged pair is cut (SEG 0.5 -> ~0.96); the residue is the
    # nearest-marker partition line vs GT's overlap-ownership convention
    assert mean > 0.9
    assert delta > 0.4
