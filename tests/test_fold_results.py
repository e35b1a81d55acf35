"""fold_results.py log parsing (the end-of-round reporting path)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "fold_results", os.path.join(REPO, "scripts", "fold_results.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_last_json_line_picks_final_json(tmp_path):
    fr = _load()
    p = tmp_path / "1c.log"
    p.write_text("noise\n"
                 + json.dumps({"value": 1.0}) + "\n"
                 + "more noise\n"
                 + json.dumps({"value": 33.4, "train_value": 41.1}) + "\n")
    d = fr.last_json_line(str(p))
    assert d["value"] == 33.4 and d["train_value"] == 41.1
    assert fr.last_json_line(str(tmp_path / "missing.log")) is None
    (tmp_path / "empty.log").write_text("no json here\n")
    assert fr.last_json_line(str(tmp_path / "empty.log")) is None


def test_seg_scores_parses_ctc_sweep_lines(tmp_path):
    fr = _load()
    p = tmp_path / "4a.log"
    p.write_text(
        "[2026-08-19 05:00:00] SEG runs/heldout/eval/Synth-N2DH-SIM/01: "
        "0.9135 (40 annotated frames)\n"
        "[2026-08-19 05:10:00] SEG runs/heldout/eval/Synth-N2DH-SIM/02: "
        "0.8990 (40 annotated frames)\n")
    s = fr.seg_scores(str(p))
    assert s == {"runs/heldout/eval/Synth-N2DH-SIM/01": 0.9135,
                 "runs/heldout/eval/Synth-N2DH-SIM/02": 0.8990}
    assert fr.seg_scores(str(tmp_path / "missing.log")) is None


def test_main_renders_pending_without_logs(tmp_path, monkeypatch, capsys):
    import sys

    fr = _load()
    monkeypatch.setattr(sys, "argv",
                        ["fold_results.py", "--logs", str(tmp_path / "logs")])
    fr.main()
    out = capsys.readouterr().out
    assert "pending" in out and "| 1c_int8_batch1 |" in out
