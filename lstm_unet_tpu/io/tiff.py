"""Grayscale TIFF read/write for CTC datasets.

Reference parity: arbellea/LSTM-UNet decodes ``t*.tif`` via cv2/imageio and
writes uint16 instance masks ``mask###.tif`` (SURVEY.md §2 "Inference reader",
"Inference driver"; BASELINE.json "TIFF in/out").

Backend order: native C codec (``native/tiffio``, built by this repo — see
``native/README.md``) → cv2 → PIL. The native codec covers the CTC fast path
(uint8/uint16 grayscale, uncompressed or deflate strips); cv2/PIL cover
everything else.
"""

from __future__ import annotations

import os

import numpy as np

_cv2 = None
_pil = None
_native = None


def _get_native():
    global _native
    if _native is None:
        try:
            from ..io import _tiffio_native as m  # ctypes wrapper around native/tiffio

            _native = m if m.available() else False
        except Exception:
            _native = False
    return _native


def _get_cv2():
    global _cv2
    if _cv2 is None:
        try:
            import cv2

            _cv2 = cv2
        except Exception:
            _cv2 = False
    return _cv2


def _get_pil():
    global _pil
    if _pil is None:
        try:
            from PIL import Image

            _pil = Image
        except Exception:
            _pil = False
    return _pil


def read_tiff(path: str) -> np.ndarray:
    """Read a grayscale TIFF as a 2D numpy array (uint8/uint16/float preserved)."""
    nat = _get_native()
    if nat:
        arr = nat.read(path)
        if arr is not None:
            return arr
    cv2 = _get_cv2()
    if cv2:
        arr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if arr is not None:
            if arr.ndim == 3:  # some writers store gray as RGB
                arr = arr[..., 0]
            return arr
    pil = _get_pil()
    if pil:
        with pil.open(path) as im:
            arr = np.asarray(im)
            if arr.ndim == 3:
                arr = arr[..., 0]
            return arr
    raise RuntimeError(f"no TIFF backend could read {path}")


def write_tiff(path: str, arr: np.ndarray) -> None:
    """Write a 2D uint8/uint16 array as TIFF (CTC masks are uint16 [H])."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError(f"CTC TIFF output must be uint8/uint16, got {arr.dtype}")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    nat = _get_native()
    if nat and nat.write(path, arr):
        return
    cv2 = _get_cv2()
    if cv2 and cv2.imwrite(path, arr):
        return
    pil = _get_pil()
    if pil:
        mode = "I;16" if arr.dtype == np.uint16 else "L"
        pil.fromarray(arr, mode=mode).save(path, format="TIFF")
        return
    raise RuntimeError(f"no TIFF backend could write {path}")
