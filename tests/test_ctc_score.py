"""ctc_score CLI: offline SEG/DET scoring of existing result masks."""

import glob
import json
import os
import re

import numpy as np
import pytest

from lstm_unet_tpu.cli.ctc_score import main
from lstm_unet_tpu.io.synthetic import write_ctc_dataset
from lstm_unet_tpu.io.tiff import read_tiff, write_tiff


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("score") / "data")
    write_ctc_dataset(root, num_frames=6, height=64, width=64)
    return root


def _write_preds(gt_root, pred_root, mutate=None):
    """Copy every GT instance mask in as a prediction (optionally mutated)."""
    for g in sorted(glob.glob(os.path.join(
            gt_root, "*", "*_GT", "SEG", "man_seg*.tif"))):
        m = re.search(r"([^/]+)/(\d+)_GT/SEG/man_seg(\d+)\.tif$", g)
        ds, seq, idx = m.group(1), m.group(2), int(m.group(3))
        res = os.path.join(pred_root, ds, f"{seq}_RES")
        os.makedirs(res, exist_ok=True)
        arr = read_tiff(g).astype(np.uint16)
        if mutate is not None:
            arr = mutate(arr)
        write_tiff(os.path.join(res, "mask%03d.tif" % idx), arr)


def test_perfect_predictions_score_one(dataset, tmp_path, capsys):
    pred = str(tmp_path / "pred")
    _write_preds(dataset, pred)
    out = str(tmp_path / "scores.json")
    main(["--pred_root", pred, "--gt_root", dataset, "--json", out])
    with open(out) as f:
        scores = json.load(f)
    assert scores["mean_seg"] == pytest.approx(1.0)
    assert scores["mean_det"] == pytest.approx(1.0)
    per = scores["Synth-N2DH-SIM/01"]
    assert per["seg"] == pytest.approx(1.0) and per["det"] == pytest.approx(1.0)
    logged = capsys.readouterr().out
    assert "SEG mean" in logged and "DET mean" in logged


def test_dropped_objects_lower_both_scores(dataset, tmp_path):
    pred = str(tmp_path / "pred")
    # delete the highest-labeled object from every frame → FN per frame
    _write_preds(dataset, pred,
                 mutate=lambda a: np.where(a == a.max(), 0, a))
    out = str(tmp_path / "scores.json")
    main(["--pred_root", pred, "--gt_root", dataset, "--json", out])
    with open(out) as f:
        scores = json.load(f)
    assert scores["mean_seg"] < 1.0
    assert scores["mean_det"] < 1.0


def test_seg_only_flag(dataset, tmp_path):
    pred = str(tmp_path / "pred")
    _write_preds(dataset, pred)
    out = str(tmp_path / "scores.json")
    main(["--pred_root", pred, "--gt_root", dataset, "--seg", "--json", out])
    with open(out) as f:
        scores = json.load(f)
    assert "mean_seg" in scores and "mean_det" not in scores


def test_no_gt_exits_loudly(dataset, tmp_path):
    pred = str(tmp_path / "pred")
    _write_preds(dataset, pred)
    with pytest.raises(SystemExit):
        main(["--pred_root", pred, "--gt_root", str(tmp_path / "nowhere")])


def test_det_seg_fallback_recorded(dataset, tmp_path, capsys):
    # no TRA markers in the synthetic layout -> DET scores against SEG GT
    # and must SAY so (ADVICE r4: partial SEG annotation deflates DET's FP
    # term on real data; the fallback is only safe for dense GT)
    pred = str(tmp_path / "pred")
    _write_preds(dataset, pred)
    out = str(tmp_path / "scores.json")
    main(["--gt_root", dataset, "--pred_root", pred, "--det",
          "--json", out])
    s = json.load(open(out))
    seq = [v for k, v in s.items() if not k.startswith("mean_")][0]
    assert seq["det_gt"] == "SEG-fallback"
    assert "SEG-fallback" in capsys.readouterr().out
