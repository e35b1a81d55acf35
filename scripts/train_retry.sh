#!/bin/bash
# Supervisor for unattended training behind a flaky device tunnel.
#
# Runs train2d with a stall watchdog; when the trainer hard-exits with the
# watchdog code (17 — see lstm_unet_tpu/utils/watchdog.py: the tunneled
# device client can wedge with all threads in futex/poll, unrecoverable
# in-process), kills nothing by pattern, just relaunches with
# --continue_run so orbax + the deterministic reader resume from the last
# checkpoint. Any other exit code is final.
#
# Usage: scripts/train_retry.sh [--max_retries N] <train2d args...>
#   A --watchdog_secs default of 900 is added unless the caller passes one
#   (must cover first-step compile, ~2-6 min on the tunneled TPU).
set -u

MAX_RETRIES=5
if [ "${1:-}" = "--max_retries" ]; then
  MAX_RETRIES=$2; shift 2
fi

ARGS=("$@")
case " $* " in
  *" --watchdog_secs "* | *" --watchdog_secs="*) ;;
  *) ARGS+=(--watchdog_secs 900) ;;
esac

attempt=0
while :; do
  python -m lstm_unet_tpu.cli.train2d "${ARGS[@]}"
  rc=$?
  if [ "$rc" -ne 17 ]; then
    exit "$rc"
  fi
  attempt=$((attempt + 1))
  if [ "$attempt" -gt "$MAX_RETRIES" ]; then
    echo "train_retry: stall watchdog fired $attempt times — giving up" >&2
    exit 17
  fi
  echo "train_retry: watchdog exit (attempt $attempt/$MAX_RETRIES) —" \
       "relaunching with --continue_run" >&2
  case " ${ARGS[*]} " in
    *" --continue_run "*) ;;
    *) ARGS+=(--continue_run) ;;
  esac
  sleep 15  # let the tunnel/runtime release the chip
done
