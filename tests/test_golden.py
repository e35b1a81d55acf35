"""Golden-checkpoint regression: the committed pre-trained checkpoint fed
through the full streaming pipeline must reproduce the committed masks
bit-for-bit (SURVEY.md §4 golden tests; VERDICT r1 #3).

Regenerate fixtures with ``python tests/golden/make_golden.py`` after an
intentional numerics change, and say so in the commit message.
"""

import glob
import os

import numpy as np
import pytest

from lstm_unet_tpu.config import CTCInferenceParams
from lstm_unet_tpu.engine.infer import run_inference
from lstm_unet_tpu.io.synthetic import write_ctc_dataset
from lstm_unet_tpu.io.tiff import read_tiff

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(GOLDEN, "ckpt")),
    reason="golden fixtures not generated")
def test_golden_checkpoint_bit_exact_masks(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(GOLDEN, "make_golden.py"))
    make_golden = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(make_golden)
    DATA = make_golden.DATA

    root = str(tmp_path / "ctc")
    write_ctc_dataset(root, **DATA)  # same frozen recipe as the fixture

    out = str(tmp_path / "res")
    ip = CTCInferenceParams(
        model_path=os.path.join(GOLDEN, "ckpt"),
        sequence_path=os.path.join(root, "Synth-N2DH-SIM", "01"),
        output_path=out, pre_sequence_frames=2, min_cell_size=5,
        dtype="float32")
    n = run_inference(ip)

    golden_masks = sorted(glob.glob(os.path.join(GOLDEN, "masks", "mask*.tif")))
    assert n == len(golden_masks) > 0
    nonzero = 0
    for g in golden_masks:
        got = read_tiff(os.path.join(out, os.path.basename(g)))
        want = read_tiff(g)
        np.testing.assert_array_equal(got, want, err_msg=os.path.basename(g))
        nonzero += int(want.max() > 0)
    assert nonzero > 0  # the golden masks actually contain instances
