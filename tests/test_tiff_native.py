"""Native TIFF codec tests: roundtrip + cross-backend agreement, including
LZW/Deflate-compressed inputs written by PIL (the codec must decode what CTC
datasets actually contain)."""

import os

import numpy as np
import pytest

from lstm_unet_tpu.io import _tiffio_native as nat
from lstm_unet_tpu.io.tiff import read_tiff, write_tiff

pytestmark = pytest.mark.skipif(
    not nat.available(), reason="native/libtiffio.so not built")


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_native_roundtrip(tmp_path, dtype, rng):
    arr = rng.integers(0, np.iinfo(dtype).max, (37, 53)).astype(dtype)
    p = str(tmp_path / "x.tif")
    assert nat.write(p, arr)
    back = nat.read(p)
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == dtype


@pytest.mark.parametrize("compression", [None, "tiff_lzw", "tiff_adobe_deflate"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_native_reads_pil_written(tmp_path, compression, dtype, rng):
    from PIL import Image

    arr = rng.integers(0, np.iinfo(dtype).max, (41, 29)).astype(dtype)
    p = str(tmp_path / "pil.tif")
    mode = "I;16" if dtype == np.uint16 else "L"
    im = Image.fromarray(arr, mode=mode)
    kw = {"compression": compression} if compression else {}
    im.save(p, format="TIFF", **kw)
    out = nat.read(p)
    assert out is not None, f"native codec rejected compression={compression}"
    np.testing.assert_array_equal(out, arr)


def test_native_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.tif")
    with open(p, "wb") as f:
        f.write(b"not a tiff at all")
    assert nat.read(p) is None


def test_tiff_facade_uses_native_first(tmp_path, rng):
    """io.tiff read/write agree across native and fallback backends."""
    arr = rng.integers(0, 65535, (25, 31)).astype(np.uint16)
    p = str(tmp_path / "f.tif")
    write_tiff(p, arr)
    np.testing.assert_array_equal(read_tiff(p), arr)
    # cv2 can read what the native writer produced
    import cv2

    np.testing.assert_array_equal(cv2.imread(p, cv2.IMREAD_UNCHANGED), arr)
