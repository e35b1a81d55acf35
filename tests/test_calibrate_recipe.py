"""Two-invocation recipe calibration driver (scripts/calibrate_recipe.py).

Reuses the postprocess-sweep fixture idea: two Gaussian cells whose
0.5-threshold interiors merge; the prob-split config must win on VAL and
its single pre-registered confirmation on "eval" (the same dump tree here)
must reproduce the VAL score. Runs the real subprocess path end-to-end,
covering --json_out plumbing in postprocess_sweep too.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lstm_unet_tpu.io.tiff import write_tiff

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from lstm_unet_tpu.ops.postprocess import postprocess_frame

    root = tmp_path_factory.mktemp("calibfix")
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
    base = np.asarray(postprocess_frame(
        probs, cell_thresh=0.5, edge_thresh=0.3, min_cell_size=50,
        grow_iters=0, fov=0)).astype(np.uint16)
    assert base.max() == 1  # merged at the production threshold
    for t in range(2):
        write_tiff(str(gt_dir / f"man_seg{t:03d}.tif"), gt)
        write_tiff(str(pred_dir / f"mask{t:03d}.tif"), base)
        np.save(str(inter / f"probs{t:03d}.npy"), probs)
    return root


def test_val_calibration_confirms_on_eval(fixture_root, tmp_path):
    out_json = tmp_path / "recipe.json"
    cmd = [sys.executable, os.path.join(HERE, "scripts", "calibrate_recipe.py"),
           "--gt_root_val", str(fixture_root / "gt"),
           "--pred_root_val", str(fixture_root / "pred"),
           "--val_seqs", "01",
           "--gt_root_eval", str(fixture_root / "gt"),
           "--pred_root_eval", str(fixture_root / "pred"),
           # tiny grids keep the test fast; the split config must still win
           "--cell_grid", "0.5", "--edge_grid", "0.3",
           "--size_filter_grid", "pre",
           "--split_hi_grid", "0.8", "--split_min_size_grid", "0",
           "--out", str(out_json)]
    r = subprocess.run(cmd, text=True, capture_output=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu",
                                PYTHONPATH=HERE))
    assert r.returncode == 0, r.stderr[-2000:]
    result = json.loads(out_json.read_text())
    assert result["winner"].get("instance_split")  # split beats no-split
    assert result["val_best"] > 0.9                # merged pair recovered
    assert result["val_baseline"] == pytest.approx(0.5, abs=0.01)
    # same dumps as "eval": the confirmation reproduces the VAL score
    assert result["eval_mean"] == pytest.approx(result["val_best"], abs=1e-9)
    # stdout's last line is the same machine-readable JSON
    last = [ln for ln in r.stdout.splitlines() if ln.strip()][-1]
    assert json.loads(last)["winner"] == result["winner"]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
