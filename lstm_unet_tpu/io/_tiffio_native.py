"""ctypes binding for the native TIFF codec (native/tiffio.cpp).

Loaded opportunistically by io/tiff.py; absence of the built library is not
an error (cv2/PIL backends take over). Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libtiffio.so"),
        os.path.join(os.path.dirname(__file__), "libtiffio.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.tiff_read.restype = ctypes.POINTER(ctypes.c_uint8)
                lib.tiff_read.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint32),
                    ctypes.POINTER(ctypes.c_uint32),
                    ctypes.POINTER(ctypes.c_uint32),
                ]
                lib.tiff_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
                lib.tiff_write.restype = ctypes.c_int
                lib.tiff_write.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
                ]
                _LIB = lib
                return _LIB
            except OSError:
                continue
    _LIB = False
    return _LIB


def available() -> bool:
    return bool(_load())


def read(path: str) -> Optional[np.ndarray]:
    """Decode a grayscale TIFF; None → caller falls back to cv2/PIL."""
    lib = _load()
    if not lib:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    bits = ctypes.c_uint32()
    buf = lib.tiff_read(path.encode(), ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(bits))
    if not buf:
        return None
    try:
        n = w.value * h.value * (bits.value // 8)
        raw = ctypes.string_at(buf, n)
    finally:
        lib.tiff_free(buf)
    dtype = np.uint16 if bits.value == 16 else np.uint8
    return np.frombuffer(raw, dtype=dtype).reshape(h.value, w.value).copy()


def write(path: str, arr: np.ndarray) -> bool:
    lib = _load()
    if not lib:
        return False
    if arr.dtype == np.uint16:
        bits = 16
    elif arr.dtype == np.uint8:
        bits = 8
    else:
        return False
    arr = np.ascontiguousarray(arr)
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return lib.tiff_write(path.encode(), ptr, arr.shape[1], arr.shape[0], bits) == 0
