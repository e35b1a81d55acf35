"""Average saved checkpoint steps into a fresh inference model dir.

Checkpoint averaging ("model soup"): a uniform parameter-space average of
late-training checkpoints is cheap variance reduction over single-step SGD
iterates. Beyond-reference capability — the reference keeps max_to_keep TF
checkpoints (SURVEY.md §5 checkpoint row) but never combines them.

Usage:
    python -m lstm_unet_tpu.cli.ckpt_avg \
        --model_path runs/myrun/ckpt --output_dir runs/myrun/soup \
        --steps 4000,5000,6000

The output dir is a standard model dir (params-only orbax checkpoint +
``model_params.json``) accepted by ``inference2d`` / ``ctc_sweep``
``--model_path`` directly. int8 runs must recalibrate activation scales on
the averaged weights (``ctc_sweep --calibrate``): ``act_scales.json`` is
intentionally not copied and the provenance guard would reject it.
"""

from __future__ import annotations

import argparse

from ..checkpoint import average_checkpoints
from ..utils import log_print


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", type=str, required=True,
                    help="training model dir (orbax steps + model_params.json)")
    ap.add_argument("--output_dir", type=str, required=True,
                    help="destination model dir for the averaged checkpoint")
    ap.add_argument("--steps", type=str, default="",
                    help="comma-separated steps to average (default: all saved)")
    ap.add_argument("--out_step", type=int, default=None,
                    help="step number for the averaged checkpoint "
                         "(default: max of the averaged steps)")
    args = ap.parse_args(argv)

    steps = [int(s) for s in args.steps.split(",") if s.strip()] or None
    out_step = average_checkpoints(args.model_path, args.output_dir,
                                   steps=steps, out_step=args.out_step)
    log_print(f"averaged {steps or 'all saved steps'} from {args.model_path} "
              f"-> {args.output_dir} (step {out_step})")


if __name__ == "__main__":
    main()
