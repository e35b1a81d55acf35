#!/bin/bash
# Chip pipeline (round 4): the FULL queued TPU workload behind one chip
# lease, restartable after preemption or a VM reset.
#
# ONE process may use the tunneled TPU at a time, and the round driver runs
# `python bench.py` at round end on the same chip. Coordination protocol:
# this script records its PROCESS GROUP id in runs/chip.lease; bench.py
# preempts the lease holder (SIGTERM the group, bounded wait, then run) so
# the driver's bench never collides with a long training/eval queue. All
# work here is preemption-safe: training checkpoints every 500 steps and
# resumes via --continue_run; eval stages are skipped once their .ok marker
# exists. Relaunching this script resumes wherever it was killed.
#
# LSTM_UNET_NO_PREEMPT is exported so the pipeline's OWN bench stages never
# preempt the pipeline itself: GNU timeout calls setpgid(0,0), so an
# internal `timeout N python bench.py` runs in a NEW process group and
# bench's own-group guard alone would not match — it would SIGTERM the
# lease group, i.e. this script (ADVICE r3 high). bench.py additionally
# skips same-session lease holders as belt and braces.
#
# Launch (survives session end):
#   setsid nohup bash scripts/chip_pipeline.sh > runs/pipeline.log 2>&1 &
#
# Queue (VERDICT r3 tasks 1,2,3,4,6,7 + TODO.md):
#   T.  v3bw retrain to step 8000 (recipe scripts/run_v3bw.sh; the step-8000
#       checkpoint from sessions 8-9 died with a VM reset)
#   1.  batched int8 streaming A/B (batch 2/4/1) — the 40-fps serving lever
#   M.  training-step A/B: B5 parity / B8 throughput / B8 adam_mu=bf16
#   2.  prob dumps (VAL train/03 + eval) for offline postprocess calibration
#   3.  re-calibrate the joint recipe for THIS model's weights (CPU-only;
#       never reuse thresholds tuned on a dead checkpoint — VERDICT r3 #1)
#   4.  recalibrated joint recipe on-chip: bf16 then int8 parity gates
#   5.  checkpoint selection: rank late saves on val (03+10), soup the best
#       two into runs/save/best (durable artifact), confirm on eval, prune
#   6.  v4 occlusion-hardness fine-tune (seeds v3bw step 8000, lr 1e-4,
#       3000 steps) + joint-recipe eval of the fine-tuned model
#   7.  non-square 690x628 rehearsal + chip-vs-CPU mask agreement
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export LSTM_UNET_NO_PREEMPT=1

DATA=/root/repo/runs/heldout
SAVE=/root/repo/runs/save
OUT=/root/repo/runs/phaseB
LOGS=$OUT/logs
LEASE=/root/repo/runs/chip.lease
mkdir -p "$OUT" "$LOGS" "$SAVE"

ps -o pgid= -p $$ | tr -d ' ' > "$LEASE"
trap 'rm -f "$LEASE"' EXIT

stage() {  # stage <name> <cmd...>: run once; skip when $LOGS/<name>.ok exists
  local name=$1; shift
  if [ -e "$LOGS/$name.ok" ]; then
    echo "=== $name: already done, skip"
    return 0
  fi
  echo "=== $name: start $(date)"
  "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  if [ "$rc" -eq 0 ]; then
    touch "$LOGS/$name.ok"
    echo "=== $name: ok $(date)"
  else
    echo "=== $name: FAILED rc=$rc (log: $LOGS/$name.log)"
  fi
  return 0  # later stages decide for themselves (most share only the model)
}

# --- T. v3bw retrain (resumes via --continue_run when a run dir exists) ----
train_v3bw() {
  local extra=()
  if ls -d "$SAVE"/v3bw_* >/dev/null 2>&1; then
    extra+=(--continue_run)
  fi
  bash scripts/run_v3bw.sh "$DATA" "$SAVE" \
    --save_checkpoint_iteration 500 "${extra[@]}"
}
stage T_train_v3bw train_v3bw
if [ ! -e "$LOGS/T_train_v3bw.ok" ]; then
  # A killed/failed training run must NOT flow into the eval stages: every
  # model-dependent number below would silently be measured on an
  # undertrained checkpoint (this happened live r4: the step-6900 trainer
  # was OOM-killed by a concurrent test-suite run and the pipeline went on
  # to bench stages with the step-6500 save as MODEL). Relaunching the
  # pipeline resumes training from the last 500-step save.
  echo "=== training did not complete — aborting (relaunch to resume)"
  exit 1
fi
MODEL=$(ls -d "$SAVE"/v3bw_* 2>/dev/null | sort | tail -1)
if [ -z "$MODEL" ]; then
  echo "=== no model dir after training — aborting eval stages"
  exit 1
fi
echo "=== model: $MODEL"
sleep 20  # let the tunnel release the chip between processes

# --- 1. batched int8 streaming A/B --------------------------------------
stage 1a_int8_batch2 timeout 900 python bench.py --no-train_too --batch 2
stage 1b_int8_batch4 timeout 900 python bench.py --no-train_too --batch 4
stage 1c_int8_batch1 timeout 900 python bench.py --no-train_too
# Mixed-precision A/B (TODO r4 #2): keep the blocked-int8-conv layout
# copies' host levels bf16 — encoder/0 alone, then encoder/0+1.
stage 1d_int8_keepf_e0 timeout 900 python bench.py --no-train_too \
  --int8_keep_float encoder/0
stage 1e_int8_keepf_e01 timeout 900 python bench.py --no-train_too \
  --int8_keep_float encoder/0,encoder/1

# --- M. training-step A/B: parity B5, throughput B8, adam_mu bf16 ---------
# (VERDICT r3 #6 + ADVICE r3 low: record BOTH the B5 parity and B8
# throughput denominators each round, and chip-measure adam_mu=bfloat16,
# which targets the measured 256 ms/step copy/pad bucket of BPTT)
stage Ma_train_B5_parity timeout 900 python bench.py --mode train --train_batch 5
stage Mb_train_B8_muf32 timeout 1200 python bench.py --mode train --mfu
stage Mc_train_B8_mubf16 timeout 1200 python bench.py --mode train --adam_mu_dtype bfloat16 --mfu

# --- 2. prob dumps (VAL + eval) + shipped-defaults scores ----------------
stage 2a_val_dump timeout 1800 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/train" --seqs 03 \
  --output_root "$OUT/val_dump" --save_intermediate --score_seg \
  --watchdog_secs 600
stage 2b_eval_dump timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/eval" \
  --output_root "$OUT/eval_dump" --save_intermediate --score_seg \
  --watchdog_secs 600

# --- 3. re-calibrate the joint recipe for THIS model (CPU-only) -----------
if [ -e "$LOGS/2a_val_dump.ok" ] && [ -e "$LOGS/2b_eval_dump.ok" ]; then
  stage 3_recalibrate python scripts/calibrate_recipe.py \
    --gt_root_val "$DATA/train" --pred_root_val "$OUT/val_dump" --val_seqs 03 \
    --gt_root_eval "$DATA/eval" --pred_root_eval "$OUT/eval_dump" \
    --out "$OUT/recipe_calibration.json"
else
  echo "=== 3: dumps missing — recalibration skipped"
fi

# The recipe for every joint-recipe stage below: the per-model calibration
# when stage 3 produced one, else the committed recommended recipe.
RECIPE="$OUT/recipe_calibration.json"
if [ ! -e "$RECIPE" ]; then
  RECIPE=/root/repo/configs/recommended.json
fi
echo "=== joint recipe: $RECIPE"

# --- 4. joint-recipe parity gates: bf16 then int8 ------------------------
stage 4a_joint_bf16 timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/eval" \
  --output_root "$OUT/eval_joint_bf16" --recipe "$RECIPE" --score_seg \
  --watchdog_secs 600
stage 4b_joint_int8 timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/eval" \
  --output_root "$OUT/eval_joint_int8" \
  --dtype int8 --calibrate 16 --recipe "$RECIPE" --score_seg \
  --watchdog_secs 600

# --- 5. checkpoint selection + durable best artifact -----------------------
# Rank the last saves on TWO val sequences (03 = crop-val, 10 = unseen-by-
# v3bw v4 sequence), soup the best two into runs/save/best (a standalone
# inference model dir that survives VM resets), confirm once on eval, and
# prune stale step dirs (VERDICT r3 tasks 4+7).
stage 5_select_best timeout 7200 python scripts/select_best.py \
  --model_path "$MODEL" --data_root "$DATA" --val_seqs 03,10 \
  --recipe "$RECIPE" --best_dir "$SAVE/best" --prune \
  --out "$OUT/select_best.json"

# --- 6. v4 occlusion-hardness fine-tune + eval -----------------------------
# Seeds the finished v3bw checkpoint; trains on v3 sequences + the v4
# intensity-matched/dynamic-contact sequences (10-12, runs/heldout has them).
train_v4ft() {
  local extra=()
  if ls -d "$SAVE"/v4ft_* >/dev/null 2>&1; then
    extra+=(--continue_run)
  fi
  bash scripts/train_retry.sh \
    --root_data_dir "$DATA/train" \
    --train_sequence_list "Synth-N2DH-SIM:01,Synth-N2DH-SIM:02,Synth-N2DH-SIM:04,Synth-N2DH-SIM:05,Synth-N2DH-SIM:06,Synth-N2DH-SIM:07,Synth-N2DH-SIM:08,Synth-N2DH-SIM:09,Synth-N2DH-SIM:10,Synth-N2DH-SIM:11,Synth-N2DH-SIM:12" \
    --val_sequence_list "Synth-N2DH-SIM:03" \
    --class_weights 0.1 0.25 0.65 \
    --batch_size 5 --unroll_len 7 --crop_size 256 256 \
    --dtype bfloat16 \
    --learning_rate 1e-4 \
    --num_iterations 3000 \
    --save_checkpoint_iteration 500 \
    --validation_interval 500 \
    --spike_factor 10 \
    --load_checkpoint --load_checkpoint_path "$MODEL/ckpt" \
    --root_save_dir "$SAVE" \
    --experiment_name v4ft \
    --seed 11 \
    "${extra[@]}"
}
stage 6a_v4_finetune train_v4ft
V4MODEL=$(ls -d "$SAVE"/v4ft_* 2>/dev/null | sort | tail -1)
if [ -n "$V4MODEL" ]; then
  stage 6b_v4_joint_eval timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$V4MODEL" --root_data_dir "$DATA/eval" \
    --output_root "$OUT/eval_joint_v4ft" --recipe "$RECIPE" --score_seg \
    --watchdog_secs 600
fi

echo "=== PIPELINE (core stages) COMPLETE $(date)"

# --- 7. non-square real-CTC-geometry rehearsal (repeat on the new model) ---
# Fluo-N2DH-SIM+ geometry (690 wide x 628 high, uint16): exercises the
# odd-height matmul-relabel padding, pad-to-16 crop-back, and FOV at
# original size ON HARDWARE. Data: runs/heldout_ns (628x690 synthetic).
NSDATA=/root/repo/runs/heldout_ns
if [ -d "$NSDATA/eval" ]; then
  stage 7a_ns_defaults timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$MODEL" --root_data_dir "$NSDATA/eval" \
    --output_root "$OUT/ns_defaults" --score_seg --watchdog_secs 600
  stage 7b_ns_joint timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$MODEL" --root_data_dir "$NSDATA/eval" \
    --output_root "$OUT/ns_joint" --recipe "$RECIPE" --score_seg \
    --watchdog_secs 600
  # cross-backend agreement on a short sequence: chip bf16 vs CPU float32
  stage 7c_ns_agree_chip timeout 1200 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$MODEL" --root_data_dir "$NSDATA/agree" \
    --output_root "$OUT/ns_agree_chip" --score_seg --watchdog_secs 600
  ns_agree_cpu() {
    JAX_PLATFORMS=cpu timeout 3000 python -m lstm_unet_tpu.cli.ctc_sweep \
      --model_path "$MODEL" --root_data_dir "$NSDATA/agree" \
      --dtype float32 --output_root "$OUT/ns_agree_cpu" --score_seg &&
    python scripts/mask_agreement.py \
      "$OUT/ns_agree_chip/Synth-N2DH-SIM/01_RES" \
      "$OUT/ns_agree_cpu/Synth-N2DH-SIM/01_RES"
  }
  stage 7d_ns_agree_cpu ns_agree_cpu
else
  echo "=== 7: $NSDATA missing — run the non-square datagen first"
fi

# --- 8. DIAGNOSTIC tail: val-vs-eval rank agreement (VERDICT r3 task 7) ---
# Lowest priority (runs only if the round's chip budget allows): re-invokes
# select_best with --eval_rank; the val sweeps + soup evals are cached from
# stage 5 (seg_scores.json per work dir), so this costs ONLY the per-step
# eval sweeps. Selection itself never uses these scores.
stage 8_eval_rank timeout 7200 python scripts/select_best.py \
  --model_path "$MODEL" --data_root "$DATA" --val_seqs 03,10 \
  --recipe "$RECIPE" --best_dir "$SAVE/best" --eval_rank \
  --out "$OUT/select_best_evalrank.json"

echo "=== PIPELINE (all stages) COMPLETE $(date)"

# --- appended mid-round (bash reads scripts lazily, so EOF-appends to the
# --- RUNNING pipeline execute; .ok markers keep relaunches idempotent) ---

# 9. v4ft checkpoint soup. Ranking the fine-tune's saves on val 03+10 would
# be contaminated (sequences 10-12 are v4ft TRAINING data; only crop-val 03
# stays clean), and single-sequence ranking is the measured inversion trap —
# so force-soup the LAST TWO saves (the BASELINE.md remedy) and confirm once
# on eval. Kept separate from the v3bw soup at best_v4; the round writeup
# compares the two eval means.
if [ -n "${V4MODEL:-}" ]; then
  V4STEPS=$(python - "$V4MODEL" <<'PY'
import os, sys
from lstm_unet_tpu.checkpoint import resolve_model_dir
d = resolve_model_dir(sys.argv[1])
s = sorted(int(x) for x in os.listdir(d) if x.isdigit())
print(",".join(map(str, s[-2:])))
PY
)
  echo "=== 9: v4ft soup steps $V4STEPS"
  stage 9_soup_v4ft timeout 3600 python scripts/select_best.py \
    --model_path "$V4MODEL" --data_root "$DATA" --val_seqs 03 \
    --steps "$V4STEPS" --recipe "$RECIPE" --best_dir "$SAVE/best_v4" \
    --out "$OUT/select_best_v4ft.json"
fi

# 10. D4 test-time-augmentation A/B on the better soup (the r3 phaseQ TTA
# stages were lost to the /tmp wipe and never ran). One pre-registered
# config on eval: the chosen joint recipe + --tta_mode d4 (8 variants).
# both-missing -> best
TTA_MODEL=$(python - "$OUT" "$SAVE" <<'PY'
import json, os, sys
out, save = sys.argv[1], sys.argv[2]
def mean(p):
    try:
        return json.load(open(p)).get("eval_soup_mean", -1)
    except Exception:
        return -1
v3 = mean(os.path.join(out, "select_best.json"))
v4 = mean(os.path.join(out, "select_best_v4ft.json"))
print(save+"/best_v4" if v4 >= max(v3, 0) else save+"/best")                    
PY
)
echo "=== 10: TTA on $TTA_MODEL"
stage 10_tta_d4 timeout 3600 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$TTA_MODEL" --root_data_dir "$DATA/eval" \
  --output_root "$OUT/eval_tta_d4" --recipe "$RECIPE" \
  --tta --tta_mode d4 --score_seg --watchdog_secs 900

echo "=== PIPELINE (appended stages) COMPLETE $(date)"

# --- 11. v4ft completion (appended late r4) --------------------------------
# Stage 6a was silently truncated at step 9000/11000: the watchdog relaunch
# resumed under the continue_run total-step bug ("0 steps remain to the
# 3000 target" — fixed in commit 253fc09; the run dir is armed with
# target_step.json=11000). Resume to 11000, then recalibrate the joint
# recipe for THESE weights (thresholds do not transfer between checkpoints;
# stage 6b's 0.69 eval mean ran the v3bw recipe on half-finetuned weights)
# and re-eval. Every stage is .ok-gated, so a later relaunch resumes here
# even if the round ends mid-training (500-step saves).
stage 11a_v4ft_resume train_v4ft
V4MODEL=$(ls -d "$SAVE"/v4ft_* 2>/dev/null | sort | tail -1)
if [ -e "$LOGS/11a_v4ft_resume.ok" ] && [ -n "$V4MODEL" ]; then
  stage 11b_v4ft_val_dump timeout 1800 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$V4MODEL" --root_data_dir "$DATA/train" --seqs 03 \
    --output_root "$OUT/v4ft_val_dump" --save_intermediate --score_seg \
    --watchdog_secs 600
  stage 11c_v4ft_eval_dump timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$V4MODEL" --root_data_dir "$DATA/eval" \
    --output_root "$OUT/v4ft_eval_dump" --save_intermediate --score_seg \
    --watchdog_secs 600
  if [ -e "$LOGS/11b_v4ft_val_dump.ok" ] && [ -e "$LOGS/11c_v4ft_eval_dump.ok" ]; then
    stage 11d_v4ft_recalibrate python scripts/calibrate_recipe.py \
      --gt_root_val "$DATA/train" --pred_root_val "$OUT/v4ft_val_dump" --val_seqs 03 \
      --gt_root_eval "$DATA/eval" --pred_root_eval "$OUT/v4ft_eval_dump" \
      --out "$OUT/v4ft_recipe_calibration.json"
  fi
  V4RECIPE="$OUT/v4ft_recipe_calibration.json"
  [ -e "$V4RECIPE" ] || V4RECIPE="$RECIPE"
  # soup the COMPLETED fine-tune's last two saves with ITS recipe; overwrite
  # the stale truncated-save soup at best_v4 (stage 9)
  V4STEPS2=$(python - "$V4MODEL" <<'PY'
import os, sys
from lstm_unet_tpu.checkpoint import resolve_model_dir
d = resolve_model_dir(sys.argv[1])
s = sorted(int(x) for x in os.listdir(d) if x.isdigit())
print(",".join(map(str, s[-2:])))
PY
)
  echo "=== 11e: v4ft soup steps $V4STEPS2 recipe $V4RECIPE"
  stage 11e_v4ft_soup timeout 3600 python scripts/select_best.py \
    --model_path "$V4MODEL" --data_root "$DATA" --val_seqs 03 \
    --steps "$V4STEPS2" --recipe "$V4RECIPE" --best_dir "$SAVE/best_v4" \
    --out "$OUT/select_best_v4ft_full.json"
fi
echo "=== PIPELINE (v4ft completion stages) COMPLETE $(date)"

# === ROUND 5 stages (appended while the r4 tail runs; bash reads scripts
# === lazily so EOF-appends execute; .ok markers keep relaunches idempotent).
# Order: cheap bounded measurements first (batch knee, grain A/B, roofline
# probes — VERDICT r4 #5/#3/#8), then the long 2-seed retrain sweep
# (VERDICT r4 #2) whose tail stages are the planned casualty if the round
# ends mid-queue (training saves every 1000 steps; selects are cached).

# 12. training batch knee: B5->B8 was +66% at ~equal step time (MFU 11.6%);
# does it stay sublinear to B12/B16? A compile-time HBM OOM is itself the
# datum (the stage records FAILED — that is the HBM verdict for the row).
stage 12a_knee_B12T7 timeout 1800 python bench.py --mode train --train_batch 12 --mfu
stage 12b_knee_B16T7 timeout 1800 python bench.py --mode train --train_batch 16 --mfu

# 13. grain-vs-threaded reader A/B on chip (the gate for adopting the
# deterministic provider in the seed sweep): 300 identical steps each;
# steps/s comes from the per-100-step log timestamps.
grain_ab() {
  local provider=$1 name=$2
  timeout 2400 python -m lstm_unet_tpu.cli.train2d \
    --root_data_dir "$DATA/train" \
    --train_sequence_list "Synth-N2DH-SIM:01,Synth-N2DH-SIM:02,Synth-N2DH-SIM:04,Synth-N2DH-SIM:05,Synth-N2DH-SIM:06,Synth-N2DH-SIM:07,Synth-N2DH-SIM:08,Synth-N2DH-SIM:09" \
    --val_sequence_list "Synth-N2DH-SIM:03" \
    --class_weights 0.1 0.25 0.65 \
    --batch_size 5 --unroll_len 7 --crop_size 256 256 \
    --dtype bfloat16 \
    --num_iterations 300 \
    --save_checkpoint_iteration 100000 \
    --validation_interval 100000 \
    --data_provider_class "$provider" \
    --root_save_dir "$OUT/grain_ab" --experiment_name "$name" --seed 5 \
    --watchdog_secs 900
}
stage 13a_grainab_threaded grain_ab CTCRAMReaderSequence2D thr
stage 13b_grainab_grain grain_ab GrainCTCReaderSequence2D grn

# 15. streaming roofline probes (config-only clones, untrained weights):
# where does the 33->40 gap live? Control + each full-res region halved.
# (Numbered 15 but run before the seed sweep: bounded, and the "perf chapter
# closed" verdict depends on them.)
stage 15a_probe_ctl       timeout 1200 python bench.py --no-train_too
stage 15b_probe_half_dec0 timeout 1200 python bench.py --no-train_too --probe half_dec0
stage 15c_probe_half_enc0 timeout 1200 python bench.py --no-train_too --probe half_enc0
stage 15d_probe_half_l0   timeout 1200 python bench.py --no-train_too --probe half_l0

# 14. 2-seed v3bw retrain sweep, grain provider (VERDICT r4 #2+#3): every
# quality number so far is one trajectory with measured ~0.06 spread. Same
# recipe, seeds 1/2, deterministic reader so relaunches REPLAY the stream.
# Selection uses the round's stage-3 recipe (calibrated on the r4 seed-0
# weights) FIXED across seeds: a consistent postprocess isolates training
# variance; per-seed recalibration is the shippable-number refinement and
# is deliberately out of scope for the spread measurement.
seed_train() {
  local seed=$1 name=$2
  local extra=()
  if ls -d "$SAVE/${name}"_* >/dev/null 2>&1; then
    extra+=(--continue_run)
  fi
  bash scripts/run_v3bw.sh "$DATA" "$SAVE" \
    --save_checkpoint_iteration 1000 \
    --data_provider_class GrainCTCReaderSequence2D \
    --seed "$seed" --experiment_name "$name" "${extra[@]}"
}
stage 14a_train_s1 seed_train 1 v3s1
S1MODEL=$(ls -d "$SAVE"/v3s1_* 2>/dev/null | sort | tail -1)
if [ -e "$LOGS/14a_train_s1.ok" ] && [ -n "$S1MODEL" ]; then
  stage 14b_select_s1 timeout 10800 python scripts/select_best.py \
    --model_path "$S1MODEL" --data_root "$DATA" --val_seqs 03,10 \
    --recipe "$RECIPE" --best_dir "$SAVE/best_s1" --skip_int8 \
    --out "$OUT/select_best_s1.json"
fi
stage 14c_train_s2 seed_train 2 v3s2
S2MODEL=$(ls -d "$SAVE"/v3s2_* 2>/dev/null | sort | tail -1)
if [ -e "$LOGS/14c_train_s2.ok" ] && [ -n "$S2MODEL" ]; then
  stage 14d_select_s2 timeout 10800 python scripts/select_best.py \
    --model_path "$S2MODEL" --data_root "$DATA" --val_seqs 03,10 \
    --recipe "$RECIPE" --best_dir "$SAVE/best_s2" --skip_int8 \
    --out "$OUT/select_best_s2.json"
fi

# 14e/f. the val-vs-eval Kendall-tau diagnostic on real saves (VERDICT r4
# #7): re-invokes select_best with --eval_rank; val sweeps + soup evals are
# fingerprint-cached from 14b/14d, so each costs ONLY the per-step eval
# sweeps. Never used for selection.
if [ -e "$LOGS/14b_select_s1.ok" ] && [ -n "$S1MODEL" ]; then
  stage 14e_evalrank_s1 timeout 10800 python scripts/select_best.py \
    --model_path "$S1MODEL" --data_root "$DATA" --val_seqs 03,10 \
    --recipe "$RECIPE" --best_dir "$SAVE/best_s1" --skip_int8 --eval_rank \
    --out "$OUT/select_best_s1_evalrank.json"
fi
if [ -e "$LOGS/14d_select_s2.ok" ] && [ -n "$S2MODEL" ]; then
  stage 14f_evalrank_s2 timeout 10800 python scripts/select_best.py \
    --model_path "$S2MODEL" --data_root "$DATA" --val_seqs 03,10 \
    --recipe "$RECIPE" --best_dir "$SAVE/best_s2" --skip_int8 --eval_rank \
    --out "$OUT/select_best_s2_evalrank.json"
fi
echo "=== PIPELINE (round-5 stages) COMPLETE $(date)"

# === 13b retry (appended): the first attempt died at step-1 metric fetch
# with a transient TPU FailedPrecondition (wedged device client — the
# known axon gotcha; 15a reproduced the control number minutes later, so
# the chip itself was healthy). No .ok was written, so this rerun is a
# no-op if a prior relaunch already completed it. The 14a/14c seed trains
# use the SAME B5T7/crop-256 config with the grain provider, so their
# steady-state frames/s prints are the backup A/B datum if the round ends
# before this line.
stage 13b_grainab_grain grain_ab GrainCTCReaderSequence2D grn
echo "=== PIPELINE (13b retry) COMPLETE $(date)"
