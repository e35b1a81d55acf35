"""Collect the chip pipeline's stage results into one markdown summary.

Reads runs/phaseB/logs/*.log (bench JSON lines, ctc_sweep SEG lines),
runs/phaseB/recipe_calibration.json and select_best*.json, and prints a
BASELINE.md-ready markdown block. Missing/unfinished stages print as
"pending" instead of failing, so this can run mid-pipeline.

Usage: python scripts/fold_results.py [--logs runs/phaseB/logs]
"""

from __future__ import annotations

import argparse
import json
import os
import re

SEG_RE = re.compile(r"SEG (\S+): ([0-9.]+) \((\d+) annotated")

BENCH_STAGES = [
    ("1c_int8_batch1", "int8 streaming B1 (r3: 33.36)"),
    ("1a_int8_batch2", "int8 streaming B2 aggregate"),
    ("1b_int8_batch4", "int8 streaming B4 aggregate"),
    ("1d_int8_keepf_e0", "int8 B1, encoder/0 kept bf16"),
    ("1e_int8_keepf_e01", "int8 B1, encoder/0+1 kept bf16"),
    ("Ma_train_B5_parity", "train B5T7 parity (r3: ~24.7)"),
    ("Mb_train_B8_muf32", "train B8T7 mu=f32 (r3: 41.09)"),
    ("Mc_train_B8_mubf16", "train B8T7 mu=bf16"),
    # round 5
    ("12a_knee_B12T7", "train B12T7 (knee probe; B8: 41.1)"),
    ("12b_knee_B16T7", "train B16T7 (knee probe)"),
    ("15a_probe_ctl", "int8 streaming control (r4: 33.2)"),
    ("15b_probe_half_dec0", "PROBE decoder L0 channels halved"),
    ("15c_probe_half_enc0", "PROBE encoder L0 channels halved"),
    ("15d_probe_half_l0", "PROBE both L0 regions halved"),
]

SEG_STAGES = [
    ("2a_val_dump", "defaults, VAL 03"),
    ("2b_eval_dump", "defaults, eval"),
    ("4a_joint_bf16", "joint recipe bf16, eval"),
    ("4b_joint_int8", "joint recipe int8, eval"),
    ("6b_v4_joint_eval", "v4 fine-tune joint, eval"),
    ("7a_ns_defaults", "non-square 628x690 defaults"),
    ("7b_ns_joint", "non-square joint recipe"),
    ("7c_ns_agree_chip", "non-square agree seq (chip)"),
    # round 5
    ("11b_v4ft_val_dump", "v4ft completed, VAL 03 defaults"),
    ("11c_v4ft_eval_dump", "v4ft completed, eval defaults"),
]


def last_json_line(path: str):
    try:
        with open(path) as f:
            lines = [l for l in f if l.startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except (OSError, json.JSONDecodeError):
        return None


def seg_scores(path: str):
    try:
        with open(path) as f:
            txt = f.read()
    except OSError:
        return None
    found = {m.group(1): float(m.group(2)) for m in SEG_RE.finditer(txt)}
    return found or None


def fmt_mean(scores):
    mean = sum(scores.values()) / len(scores)
    per = ", ".join(f"{os.path.basename(k.rstrip('/'))}={v:.4f}"
                    for k, v in sorted(scores.items()))
    return f"**{mean:.4f}** ({per})"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", default="runs/phaseB/logs")
    args = ap.parse_args()
    logs = args.logs
    out_root = os.path.dirname(logs.rstrip("/"))

    print("## Chip pipeline results (auto-collected by scripts/fold_results.py)\n")

    print("### Throughput (bench.py JSON lines)\n")
    print("| stage | config | frames/s/chip | extra |")
    print("|---|---|---|---|")
    for name, desc in BENCH_STAGES:
        d = last_json_line(os.path.join(logs, f"{name}.log"))
        done = os.path.exists(os.path.join(logs, f"{name}.ok"))
        if not d:
            print(f"| {name} | {desc} | pending | |")
            continue
        extras = []
        if "train_mfu" in d:
            extras.append(f"MFU {d['train_mfu']:.3f} "
                          f"({d.get('train_flops_per_step', 0)/1e12:.2f} TFLOP/step)")
        if "train_value" in d:
            extras.append(f"train {d['train_value']}")
        if "error" in d:
            extras.append("ERROR: " + d["error"][:60])
        mark = "" if done else " (stage not .ok)"
        print(f"| {name} | {desc} | {d.get('value', '?')}{mark} | "
              f"{'; '.join(extras)} |")

    print("\n### SEG (ctc_sweep --score_seg)\n")
    print("| stage | config | SEG mean (per-seq) |")
    print("|---|---|---|")
    for name, desc in SEG_STAGES:
        s = seg_scores(os.path.join(logs, f"{name}.log"))
        print(f"| {name} | {desc} | {fmt_mean(s) if s else 'pending'} |")

    recal = os.path.join(out_root, "recipe_calibration.json")
    if os.path.exists(recal):
        with open(recal) as f:
            r = json.load(f)
        print("\n### Recalibrated joint recipe (stage 3)\n")
        print("```json")
        print(json.dumps(r, indent=1)[:2000])
        print("```")
    else:
        print("\n### Recalibrated joint recipe: pending")

    for tag, fn in [("select_best (stage 5)", "select_best.json"),
                    ("eval-rank diagnostic (stage 8)",
                     "select_best_evalrank.json"),
                    ("v4ft truncated soup (stage 9)", "select_best_v4ft.json"),
                    ("v4ft completed soup, recalibrated recipe (stage 11e)",
                     "select_best_v4ft_full.json"),
                    ("seed-1 selection (stage 14b)", "select_best_s1.json"),
                    ("seed-2 selection (stage 14d)", "select_best_s2.json"),
                    ("seed-1 eval-rank tau (stage 14e)",
                     "select_best_s1_evalrank.json"),
                    ("seed-2 eval-rank tau (stage 14f)",
                     "select_best_s2_evalrank.json")]:
        p = os.path.join(out_root, fn)
        if os.path.exists(p):
            with open(p) as f:
                s = json.load(f)
            print(f"\n### {tag}\n")
            for r in s.get("val_ranking", []):
                line = (f"- step {r['step']}: val {r['val_mean']}"
                        + (f", det {r['val_det_mean']}"
                           if "val_det_mean" in r else "")
                        + (f", eval {r['eval_mean']}" if "eval_mean" in r
                           else ""))
                print(line)
            if "val_seg_det_tau" in s:
                print(f"- val SEG-vs-DET tau: {s['val_seg_det_tau']}")
            if "soup_steps" in s:
                # the shipped artifact may be a single step when the
                # val-gated transient guard rejected the soup
                art = s.get("artifact_steps", s["soup_steps"])
                label = (f"soup{art}" if art == s["soup_steps"]
                         else f"single-step{art} (transient guard: "
                              f"soup{s['soup_steps']} lost on val)")
                print(f"- shipped {label}: eval "
                      f"{s.get('eval_soup_mean', 'pending')}"
                      + (f" (det {s['eval_soup_det_mean']})"
                         if "eval_soup_det_mean" in s else "")
                      + f" | int8 {s.get('eval_soup_int8_mean', 'pending')}")
            if "rank_agreement_tau" in s:
                print(f"- val-vs-eval Kendall tau: {s['rank_agreement_tau']}")
            if "pruned_steps" in s:
                print(f"- pruned step dirs: {s['pruned_steps']}")
        else:
            print(f"\n### {tag}: pending")

    # 7d mask agreement (chip vs CPU) prints its own summary line
    p = os.path.join(logs, "7d_ns_agree_cpu.log")
    if os.path.exists(p):
        with open(p) as f:
            tail = f.read().strip().splitlines()[-3:]
        print("\n### chip-vs-CPU mask agreement (stage 7d)\n")
        for l in tail:
            print(f"    {l}")

    # trainer-log throughput (grain A/B + seed trains): mean of the
    # per-100-step frames/s prints over the steady tail
    fps_re = re.compile(r"step \d+: .*\(([0-9.]+) frames/s\)")
    rows = []
    for name, desc in [("13a_grainab_threaded", "300-step threaded reader"),
                       ("13b_grainab_grain", "300-step grain reader"),
                       ("14a_train_s1", "seed-1 v3bw retrain (grain)"),
                       ("14c_train_s2", "seed-2 v3bw retrain (grain)")]:
        try:
            with open(os.path.join(logs, f"{name}.log")) as f:
                vals = [float(m.group(1)) for m in fps_re.finditer(f.read())]
        except OSError:
            vals = []
        # drop the first print (amortizes compile) and average the rest
        tailv = vals[1:] or vals
        rows.append((name, desc,
                     f"{sum(tailv)/len(tailv):.2f}" if tailv else "pending",
                     len(vals)))
    print("\n### Trainer-log throughput (frames/s, mean of steady prints)\n")
    print("| stage | config | frames/s | prints |")
    print("|---|---|---|---|")
    for name, desc, v, n in rows:
        print(f"| {name} | {desc} | {v} | {n} |")


if __name__ == "__main__":
    main()
