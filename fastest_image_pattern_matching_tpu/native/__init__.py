"""Native C++ runtime components (ctypes bindings).

Builds fipm_native.so from src/ on first use (g++ -O2, no external deps)
and caches it next to the sources. See src/fipm_native.cc for what lives
here and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "fipm_native.cc")
_SO = os.path.join(_DIR, "fipm_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.fipm_bmp_load_gray.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.fipm_bmp_load_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.fipm_bmp_save_gray.restype = ctypes.c_int
        lib.fipm_bmp_save_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
        lib.fipm_free.argtypes = [ctypes.c_void_p]
        lib.fipm_extract_peaks.restype = ctypes.c_int
        lib.fipm_extract_peaks.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float)]
        lib.fipm_filter_overlaps.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_double, ctypes.c_double]
        lib.fipm_loader_create.restype = ctypes.c_void_p
        lib.fipm_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int]
        lib.fipm_loader_shape.restype = ctypes.c_int
        lib.fipm_loader_shape.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.fipm_loader_take.restype = ctypes.c_int
        lib.fipm_loader_take.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.fipm_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
