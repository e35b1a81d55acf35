#!/bin/bash
# Chip pipeline (round 3, session 11): the FULL queued TPU workload behind
# one chip lease, restartable after preemption or a VM reset.
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
# Launch (survives session end):
#   setsid nohup bash scripts/chip_pipeline.sh > runs/pipeline.log 2>&1 &
#
# Queue (see TODO.md / BASELINE.md session 10):
#   T.  v3bw retrain to step 8000 (recipe scripts/run_v3bw.sh; the step-8000
#       checkpoint from sessions 8-9 died with a VM reset)
#   1.  batched int8 streaming A/B (batch 2/4/1) — the 40-fps serving lever
#   2.  prob dumps (VAL train/03 + eval) for offline postprocess calibration
#   3.  shipped-defaults eval (--score_seg) for cross-session comparability
#   4.  VAL-calibrated joint recipe on-chip: bf16 then int8 parity gates
#   5.  soup(7000,8000) joint-recipe eval
#   6.  v4 occlusion-hardness fine-tune (seeds v3bw step 8000, lr 1e-4,
#       3000 steps) + joint-recipe eval of the fine-tuned model
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

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

JOINT=(--cell_thresh 0.55 --edge_thresh 0.30 --size_filter post
       --instance_split --split_method prob --split_hi_thresh 0.8
       --split_erode 1 --split_min_size 3500)

# --- 2. prob dumps (VAL + eval) + 3. shipped-defaults scores -------------
stage 2a_val_dump timeout 1800 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/train" --seqs 03 \
  --output_root "$OUT/val_dump" --save_intermediate --score_seg
stage 2b_eval_dump timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/eval" \
  --output_root "$OUT/eval_dump" --save_intermediate --score_seg

# --- 4. joint-recipe parity gates: bf16 then int8 ------------------------
stage 4a_joint_bf16 timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/eval" \
  --output_root "$OUT/eval_joint_bf16" "${JOINT[@]}" --score_seg
stage 4b_joint_int8 timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL" --root_data_dir "$DATA/eval" \
  --output_root "$OUT/eval_joint_int8" \
  --dtype int8 --calibrate 16 "${JOINT[@]}" --score_seg

# --- 5. soup(7000,8000) joint-recipe eval ---------------------------------
soup_eval() {
  timeout 600 python -m lstm_unet_tpu.cli.ckpt_avg --model_path "$MODEL" \
    --output_dir "$MODEL/soup78" --steps 7000,8000 &&
  timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$MODEL/soup78" --root_data_dir "$DATA/eval" \
    --output_root "$OUT/eval_joint_soup78" "${JOINT[@]}" --score_seg
}
stage 5_soup78 soup_eval

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
    --output_root "$OUT/eval_joint_v4ft" "${JOINT[@]}" --score_seg
fi

echo "=== PIPELINE COMPLETE $(date)"

# --- 7. non-square real-CTC-geometry rehearsal (VERDICT r2 task #5) -------
# Fluo-N2DH-SIM+ geometry (690 wide x 628 high, uint16): exercises the
# odd-height matmul-relabel padding, pad-to-16 crop-back, and FOV at
# original size ON HARDWARE. Data: runs/heldout_ns (628x690 synthetic).
NSDATA=/root/repo/runs/heldout_ns
if [ -d "$NSDATA/eval" ]; then
  stage 7a_ns_defaults timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$MODEL" --root_data_dir "$NSDATA/eval" \
    --output_root "$OUT/ns_defaults" --score_seg
  stage 7b_ns_joint timeout 2700 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$MODEL" --root_data_dir "$NSDATA/eval" \
    --output_root "$OUT/ns_joint" "${JOINT[@]}" --score_seg
  # cross-backend agreement on a short sequence: chip bf16 vs CPU float32
  stage 7c_ns_agree_chip timeout 1200 python -m lstm_unet_tpu.cli.ctc_sweep \
    --model_path "$MODEL" --root_data_dir "$NSDATA/agree" \
    --output_root "$OUT/ns_agree_chip" --score_seg
  ns_agree_cpu() {
    JAX_PLATFORMS=cpu timeout 3000 python -m lstm_unet_tpu.cli.ctc_sweep \
      --model_path "$MODEL" --root_data_dir "$NSDATA/agree" \
      --dtype float32 --output_root "$OUT/ns_agree_cpu" --score_seg &&
    python scripts/mask_agreement.py \
      "$OUT/ns_agree_chip/Synth-N2DH-SIM/01" \
      "$OUT/ns_agree_cpu/Synth-N2DH-SIM/01"
  }
  stage 7d_ns_agree_cpu ns_agree_cpu
else
  echo "=== 7: $NSDATA missing — run the non-square datagen first"
fi

echo "=== PIPELINE (incl. stage 7) COMPLETE $(date)"

# --- 8. offline joint-recipe re-calibration for THIS model (CPU-only) ------
# The 0.9135 recipe was calibrated on an older checkpoint's dumps; the
# honest per-model protocol re-runs it: sweep on VAL (train/03), confirm
# the single winner once on eval (scripts/calibrate_recipe.py).
if [ -e "$LOGS/2a_val_dump.ok" ] && [ -e "$LOGS/2b_eval_dump.ok" ]; then
  stage 8_recalibrate python scripts/calibrate_recipe.py \
    --gt_root_val "$DATA/train" --pred_root_val "$OUT/val_dump" --val_seqs 03 \
    --gt_root_eval "$DATA/eval" --pred_root_eval "$OUT/eval_dump" \
    --out "$OUT/recipe_calibration.json"
else
  echo "=== 8: dumps missing — recalibration skipped"
fi

echo "=== PIPELINE (incl. stages 7-8) COMPLETE $(date)"
