"""Convert a reference (TF2/Keras) checkpoint into a loadable model dir.

Reference parity: the reference README distributes pretrained TF2
checkpoints (SURVEY.md §2 "README/docs" [M]); this converter maps them onto
ULSTMnet2D params (checkpoint/tf_import.py) and writes an orbax checkpoint +
``model_params.json``, i.e. a directory that ``inference2d``/``ctc_sweep``
``--model_path`` accepts directly. Conversion is for inference/fine-tune
initialization; no optimizer state is imported.

Usage:
    python -m lstm_unet_tpu.cli.import_tf \
        --tf_prefix ~/models/LSTMUNet/Fluo-N2DH-SIM+/model.ckpt \
        --net_kernel_params arch.json --output_dir runs/imported

``--net_kernel_params`` describes the architecture of the TF model (the
reference pickles it next to its checkpoints; translate that to the JSON
schema). The importer fails loudly on any shape mismatch.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import numpy as np

from ..checkpoint import CheckpointManager, save_model_params
from ..checkpoint.tf_import import import_keras_ulstm
from ..config import NetKernelParams, default_net_kernel_params
from ..models import ModelConfig, ULSTMnet2D
from ..utils import log_print


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tf_prefix", type=str, required=True,
                    help="TF checkpoint prefix (files <prefix>.index + "
                         "<prefix>.data-*)")
    ap.add_argument("--output_dir", type=str, required=True)
    ap.add_argument("--net_kernel_params", type=str,
                    help="JSON file or inline JSON; default: flagship arch")
    ap.add_argument("--list", action="store_true", dest="list_only",
                    help="only list the checkpoint's variables and exit")
    args = ap.parse_args(argv)

    if args.list_only:
        from ..checkpoint.tf_bundle import TFBundle

        for name, shape in TFBundle.open(args.tf_prefix).list_variables():
            print(name, list(shape))
        return

    if args.net_kernel_params:
        try:
            d = json.loads(args.net_kernel_params)
        except json.JSONDecodeError:
            with open(args.net_kernel_params) as f:
                d = json.load(f)
        nkp = NetKernelParams.from_dict(d)
    else:
        nkp = default_net_kernel_params()
    cfg = ModelConfig.make(nkp)
    template = ULSTMnet2D.init(jax.random.PRNGKey(0), cfg)
    imported, report = import_keras_ulstm(args.tf_prefix, template)
    for slot, path in report.items():
        log_print(f"  {slot} <- {path}")
    params = jax.tree_util.tree_map(jax.numpy.asarray, imported)
    mgr = CheckpointManager(args.output_dir)
    # placeholder opt_state: conversion carries weights only (restore with
    # restore_params_only, as the inference engine does)
    mgr.save(0, params, {"imported": np.zeros((1,), np.float32)})
    mgr.wait()
    save_model_params(args.output_dir, {
        "model_config": dataclasses.asdict(cfg),
        "imported_from": args.tf_prefix,
    })
    log_print(f"imported {len(report)} layers -> {args.output_dir}")


if __name__ == "__main__":
    main()
