"""BMP load/save via the native codec."""

from __future__ import annotations

import ctypes

import numpy as np

from . import get_lib


def available() -> bool:
    return get_lib() is not None


def load_gray(path: str) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = lib.fipm_bmp_load_gray(path.encode(), ctypes.byref(w),
                                 ctypes.byref(h))
    if not buf:
        raise ValueError(f"cannot decode BMP: {path}")
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value)).copy()
    finally:
        lib.fipm_free(buf)
    return arr


def save_gray(path: str, img: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    rc = lib.fipm_bmp_save_gray(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[1], img.shape[0])
    if rc != 0:
        raise IOError(f"cannot write BMP: {path}")
