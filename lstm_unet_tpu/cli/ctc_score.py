"""Score existing CTC result masks: SEG and/or DET, no model required.

The reference workflow depends on the CTC organizers' closed-source
evaluation executable for official scores (SURVEY.md §4); this CLI is the
hermetic equivalent over the standard on-disk layout:

    <pred_root>/<dataset>/<seq>_RES/mask*.tif     (uint16 instance labels)
    <gt_root>/<dataset>/<seq>_GT/SEG/man_seg*.tif (SEG ground truth)
    <gt_root>/<dataset>/<seq>_GT/TRA/man_track*.tif (DET markers, optional)

Sparse GT is aligned by frame index, exactly as `ctc_sweep --score_seg`
does after a sweep — this tool scores masks produced by ANY run (including
a preempted pipeline's partial outputs) without touching the device.

Usage:
    python -m lstm_unet_tpu.cli.ctc_score --gt_root data/eval \
        --pred_root runs/phaseB/eval_dump [--seg] [--det] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os

from ..metrics import det_measure_sequence, seg_measure_sequence
from ..utils import log_print


def find_result_dirs(pred_root: str):
    """Yield (dataset, seq, res_dir) for every *_RES dir under pred_root."""
    for ds in sorted(os.listdir(pred_root)):
        ds_dir = os.path.join(pred_root, ds)
        if not os.path.isdir(ds_dir):
            continue
        for name in sorted(os.listdir(ds_dir)):
            if name.endswith("_RES") and os.path.isdir(
                    os.path.join(ds_dir, name)):
                yield ds, name[:-4], os.path.join(ds_dir, name)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="score CTC masks (SEG/DET) against ground truth")
    ap.add_argument("--pred_root", required=True,
                    help="root holding <dataset>/<seq>_RES mask dirs")
    ap.add_argument("--gt_root", required=True,
                    help="root holding <dataset>/<seq>_GT ground truth")
    ap.add_argument("--seg", action="store_true", help="score SEG")
    ap.add_argument("--det", action="store_true",
                    help="score DET (TRA markers when present, else SEG GT)")
    ap.add_argument("--json", default="",
                    help="also write scores to this JSON file")
    args = ap.parse_args(argv)
    if not (args.seg or args.det):
        args.seg = args.det = True

    from .ctc_sweep import _aligned_gt_pred

    results = {}
    n_scored = 0
    for ds, seq, res_dir in find_result_dirs(args.pred_root):
        gt_base = os.path.join(args.gt_root, ds, seq + "_GT")
        entry = {}
        if args.seg:
            gts, preds = _aligned_gt_pred(os.path.join(gt_base, "SEG"),
                                          "man_seg*.tif", res_dir)
            if gts:
                entry["seg"] = seg_measure_sequence(gts, preds)
                entry["seg_frames"] = len(gts)
                log_print(f"SEG {ds}/{seq}: {entry['seg']:.4f} "
                          f"({len(gts)} annotated frames)")
        if args.det:
            gts, preds = _aligned_gt_pred(os.path.join(gt_base, "TRA"),
                                          "man_track*.tif", res_dir)
            det_gt = "TRA"
            if not gts:
                gts, preds = _aligned_gt_pred(os.path.join(gt_base, "SEG"),
                                              "man_seg*.tif", res_dir)
                det_gt = "SEG-fallback"
            if gts:
                entry["det"] = det_measure_sequence(gts, preds)
                entry["det_frames"] = len(gts)
                entry["det_gt"] = det_gt
                if det_gt == "SEG-fallback":
                    # ADVICE r4: real CTC SEG GT can be PARTIALLY annotated
                    # within a frame — every correctly-detected-but-
                    # unannotated cell then counts as a DET false positive
                    # (SEG's per-GT-object scoring is immune; DET's FP term
                    # is not). Dense synthetic GT is safe; real data needs
                    # TRA markers for a faithful DET.
                    log_print(f"DET {ds}/{seq}: no TRA markers — scoring "
                              "against SEG GT (caveat: partial SEG "
                              "annotation deflates DET via spurious FPs; "
                              "det_gt='SEG-fallback' recorded)")
                log_print(f"DET {ds}/{seq}: {entry['det']:.4f} "
                          f"({len(gts)} annotated frames)")
        if entry:
            results[f"{ds}/{seq}"] = entry
            n_scored += 1
        else:
            log_print(f"skip {ds}/{seq}: no ground truth under {gt_base}")

    if not n_scored:
        raise SystemExit(f"nothing scored: no GT-matched *_RES dirs under "
                         f"{args.pred_root}")
    per_seq = list(results.values())
    for key in ("seg", "det"):
        vals = [e[key] for e in per_seq if key in e]
        if vals:
            mean = sum(vals) / len(vals)
            results[f"mean_{key}"] = mean
            log_print(f"{key.upper()} mean over {len(vals)} sequence(s): "
                      f"{mean:.4f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        log_print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
