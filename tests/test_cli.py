"""CLI argument-surface tests (reference contract: argparse overrides map
onto Params fields — SURVEY.md §1 L3)."""

import json

import pytest

from lstm_unet_tpu.cli.inference2d import build_parser as infer_parser
from lstm_unet_tpu.cli.train2d import _parse_seq_list, build_parser as train_parser


def test_train_parser_seq_list_and_types():
    args = train_parser().parse_args([
        "--train_sequence_list", "Fluo-N2DH-SIM+:01,DIC-C2DH-HeLa:02",
        "--crop_size", "128", "96",
        "--batch_size", "3",
        "--class_weights", "0.1", "0.3", "0.6",
        "--dry_run",
        "--gt_is_full_seg", "false",
    ])
    assert args.train_sequence_list == [("Fluo-N2DH-SIM+", "01"),
                                        ("DIC-C2DH-HeLa", "02")]
    assert args.crop_size == [128, 96]
    assert args.batch_size == 3
    assert args.dry_run is True
    assert args.gt_is_full_seg is False


def test_seq_list_handles_colons_in_dataset_name():
    # rsplit: only the LAST colon separates the sequence id
    assert _parse_seq_list("weird:name:01") == [("weird:name", "01")]


def test_infer_parser_requires_paths():
    with pytest.raises(SystemExit):
        infer_parser().parse_args(["--model_path", "x"])  # missing required
    args = infer_parser().parse_args([
        "--model_path", "m", "--sequence_path", "s", "--output_path", "o",
        "--FOV", "25", "--digit_4",
        "--boundary_growth", "dilate", "--grow_iters", "5",
    ])
    assert args.FOV == 25 and args.digit_4 is True
    assert args.boundary_growth == "dilate" and args.grow_iters == 5
    with pytest.raises(SystemExit):  # invalid growth mode rejected
        infer_parser().parse_args([
            "--model_path", "m", "--sequence_path", "s", "--output_path", "o",
            "--boundary_growth", "bogus"])


def test_unset_flags_do_not_override_defaults():
    """None-valued argparse results must not clobber CTCInferenceParams
    defaults (override() skips None)."""
    from lstm_unet_tpu.config import CTCInferenceParams

    args = vars(infer_parser().parse_args(
        ["--model_path", "m", "--sequence_path", "s", "--output_path", "o"]))
    p = CTCInferenceParams()
    default_min = p.min_cell_size
    p.override(**args)
    assert p.min_cell_size == default_min
    assert p.model_path == "m"


def test_infer_parser_int8_calibrate_fused_surface():
    args = infer_parser().parse_args([
        "--model_path", "m", "--sequence_path", "s", "--output_path", "o",
        "--dtype", "int8", "--calibrate", "8", "--fused_cell",
        "--state_dtype", "float32",
    ])
    assert args.dtype == "int8" and args.calibrate == 8
    assert args.fused_cell is True and args.state_dtype == "float32"


def test_import_tf_parser_surface(tmp_path):
    """--list on a fabricated bundle prints variables and exits cleanly."""
    import numpy as np

    from lstm_unet_tpu.checkpoint.tf_bundle import write_bundle
    from lstm_unet_tpu.cli.import_tf import main as import_main

    prefix = str(tmp_path / "model.ckpt")
    write_bundle(prefix, {"a/kernel": np.zeros((2, 2), np.float32)})
    import_main(["--tf_prefix", prefix, "--output_dir", str(tmp_path / "o"),
                 "--list"])
