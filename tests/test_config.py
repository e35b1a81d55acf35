"""Config layer tests: JSON round-trip, CLI-style overrides, derived dirs
(reference behaviors of Params.py — SURVEY.md §3.5)."""

import json
import os

import pytest

from lstm_unet_tpu.config import (
    CTCInferenceParams,
    CTCParams,
    NetKernelParams,
    default_net_kernel_params,
    tiny_net_kernel_params,
)


def test_net_kernel_params_roundtrip():
    nkp = default_net_kernel_params()
    back = NetKernelParams.from_dict(json.loads(json.dumps(nkp.to_dict())))
    assert back.to_dict() == nkp.to_dict()
    assert back.depth == 4


def test_net_kernel_params_validates_level_counts():
    with pytest.raises(ValueError):
        NetKernelParams(lstm_kernels=[[(3, 8)]],
                        down_conv_kernels=[[(3, 8)], [(3, 16)]],
                        up_conv_kernels=[[(3, 8)], [(3, 16)]])


def test_ctc_params_json_roundtrip(tmp_path):
    p = CTCParams(batch_size=7, unroll_len=4, dry_run=True,
                  net_kernel_params=tiny_net_kernel_params(),
                  class_weights=(0.1, 0.2, 0.7))
    path = str(tmp_path / "p.json")
    p.save_json(path)
    q = CTCParams.load_json(path)
    assert q.batch_size == 7 and q.unroll_len == 4
    assert q.net_kernel_params.to_dict() == p.net_kernel_params.to_dict()
    assert tuple(q.class_weights) == (0.1, 0.2, 0.7)


def test_override_rejects_unknown_and_skips_none():
    p = CTCInferenceParams(dry_run=True)
    p.override(min_cell_size=42, FOV=None)
    assert p.min_cell_size == 42 and p.FOV == 0
    with pytest.raises(AttributeError):
        p.override(not_a_knob=1)


def test_resolve_dirs(tmp_path):
    p = CTCParams(experiment_name="X", root_save_dir=str(tmp_path),
                  net_kernel_params=tiny_net_kernel_params())
    p.resolve_dirs(timestamp="TS")
    assert p.experiment_save_dir.endswith(os.path.join("X_TS", "ckpt"))
    assert os.path.isdir(p.experiment_save_dir)
    assert os.path.isdir(p.experiment_log_dir)

    q = CTCParams(experiment_name="Y", root_save_dir=str(tmp_path), dry_run=True,
                  net_kernel_params=tiny_net_kernel_params())
    q.resolve_dirs(timestamp="TS")
    assert not os.path.isdir(q.experiment_save_dir)  # dry_run skips writes
