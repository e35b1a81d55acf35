#!/bin/bash
# The v3bw recipe (round 3): boundary-weighted training on the protocol-v3
# occlusion-heavy held-out TRAIN split. This is the exact command behind the
# BASELINE.md round-3 chip results (held-out SEG 0.8976 @ step 8000; the
# VAL-calibrated joint postprocess recipe on top reached 0.9135).
#
# Recorded as a script because the /tmp-based runs (and the step-8000
# checkpoint) did not survive a VM reset — the recipe lives in git now.
#
# Usage: scripts/run_v3bw.sh <data_root> <save_root> [extra train2d args...]
#   data_root: output of `scripts/heldout_protocol.py gen --root <data_root>`
#   (the TRAIN split lives at <data_root>/train). Sequences 01,02,04-09 are
#   protocol v1-v3 training; 03 is crop-validation; eval/ stays unseen.
#
# Notes vs the original r3 run:
# - spike guard ARMED (factor 10): the original continuation hit a finite
#   loss spike at ~8500 that permanently cost -0.043 held-out SEG; the
#   guard rolls back to the last save and keeps the reader position.
# - watchdog + retry supervisor on by default (train_retry.sh adds
#   --watchdog_secs 900).
set -eu
DATA_ROOT=$1
SAVE_ROOT=$2
shift 2

exec bash "$(dirname "$0")/train_retry.sh" \
  --root_data_dir "$DATA_ROOT/train" \
  --train_sequence_list "Synth-N2DH-SIM:01,Synth-N2DH-SIM:02,Synth-N2DH-SIM:04,Synth-N2DH-SIM:05,Synth-N2DH-SIM:06,Synth-N2DH-SIM:07,Synth-N2DH-SIM:08,Synth-N2DH-SIM:09" \
  --val_sequence_list "Synth-N2DH-SIM:03" \
  --class_weights 0.1 0.25 0.65 \
  --batch_size 5 --unroll_len 7 --crop_size 256 256 \
  --dtype bfloat16 \
  --num_iterations 8000 \
  --save_checkpoint_iteration 1000 \
  --validation_interval 500 \
  --spike_factor 10 \
  --root_save_dir "$SAVE_ROOT" \
  --experiment_name v3bw \
  --seed 0 \
  "$@"
