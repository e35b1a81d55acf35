#!/bin/bash
# Phase B (round 3, session 10): chip queue that runs AFTER the v3bw retrain
# (scripts/run_v3bw.sh) releases the chip. ONE process may use the TPU at a
# time, so everything is strictly sequential behind the trainer pid.
#
# Usage: scripts/phaseB.sh <trainer_pid> <model_dir>
#   trainer_pid: pid of the run_v3bw.sh supervisor (waits for exit)
#   model_dir:   the run dir train2d created (contains model_params.json)
#
# Queue:
#   1. batched int8 streaming A/B (--batch 2/4): bf16 batching measured flat
#      (bandwidth-bound, BASELINE.md roofline) but int8 sits at ~33% HBM BW,
#      so aggregate serving throughput is the untested 40-fps lever.
#   2. prob dumps for offline postprocess calibration: VAL (train/03) +
#      eval 01-03, bf16 — the session-9 dumps died with /tmp.
#   3. shipped-defaults eval (--score_seg) for cross-session comparability.
#   4. VAL-calibrated joint recipe on-chip: bf16 then int8 (calibrated) —
#      the pending session-9 parity gates.
#   5. soup(7000,8000) joint-recipe eval.
set -x
TRAIN_PID=$1
MODEL=$2
DATA=/root/repo/runs/heldout
OUT=/root/repo/runs/phaseB
mkdir -p "$OUT"

while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 60; done
echo "=== trainer gone; phase B starts $(date) ==="
sleep 30  # let the tunnel release the chip

echo "--- 1a. infer int8 batch=2 ---"
timeout 900 python bench.py --no-train_too --batch 2
echo "--- 1b. infer int8 batch=4 ---"
timeout 900 python bench.py --no-train_too --batch 4
echo "--- 1c. infer int8 batch=1 control ---"
timeout 900 python bench.py --no-train_too

JOINT="--cell_thresh 0.55 --edge_thresh 0.30 --size_filter post \
  --instance_split --split_method prob --split_hi_thresh 0.8 \
  --split_erode 1 --split_min_size 3500"

echo "--- 2a. VAL (train/03) prob dump, bf16 defaults ---"
timeout 1800 python -m lstm_unet_tpu.cli.ctc_sweep --model_path "$MODEL" \
  --root_data_dir "$DATA/train" --seqs 03 --output_root "$OUT/val_dump" \
  --save_intermediate --score_seg
echo "--- 2b. eval prob dump + shipped-defaults score, bf16 ---"
timeout 2400 python -m lstm_unet_tpu.cli.ctc_sweep --model_path "$MODEL" \
  --root_data_dir "$DATA/eval" --output_root "$OUT/eval_dump" \
  --save_intermediate --score_seg

echo "--- 4a. joint recipe on-chip bf16 ---"
timeout 2400 python -m lstm_unet_tpu.cli.ctc_sweep --model_path "$MODEL" \
  --root_data_dir "$DATA/eval" --output_root "$OUT/eval_joint_bf16" \
  $JOINT --score_seg
echo "--- 4b. joint recipe on-chip int8 (fresh calibration) ---"
timeout 2400 python -m lstm_unet_tpu.cli.ctc_sweep --model_path "$MODEL" \
  --root_data_dir "$DATA/eval" --output_root "$OUT/eval_joint_int8" \
  --dtype int8 --calibrate 16 $JOINT --score_seg

echo "--- 5. soup(7000,8000) joint recipe bf16 ---"
timeout 600 python -m lstm_unet_tpu.cli.ckpt_avg --model_path "$MODEL" \
  --output_dir "$MODEL/soup78" --steps 7000,8000
timeout 2400 python -m lstm_unet_tpu.cli.ctc_sweep \
  --model_path "$MODEL/soup78" \
  --root_data_dir "$DATA/eval" --output_root "$OUT/eval_joint_soup78" \
  $JOINT --score_seg

echo "=== PHASE B done $(date) ==="
