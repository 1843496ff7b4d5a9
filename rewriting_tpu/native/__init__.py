"""Native (C++) runtime components, loaded via ctypes with pure-Python
fallbacks.

Currently: a fast zlib-based PNG encoder for the metric pipelines' bulk
image dumps (see pngenc.cpp).  Build lazily with g++ on first use; callers
must handle ``encode_png is None`` (PIL fallback)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_pngenc.so")
_SRC = os.path.join(_DIR, "pngenc.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        def build():
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-lz",
                 "-o", _SO + ".tmp"],
                check=True, capture_output=True)
            os.replace(_SO + ".tmp", _SO)

        def load():
            lib = ctypes.CDLL(_SO)
            lib.png_encode_rgb8.restype = ctypes.c_long
            lib.png_encode_rgb8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
            return lib

        try:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                build()
            try:
                _lib = load()
            except OSError:
                # stale/foreign binary (different arch/glibc): rebuild
                # once from source before giving up
                build()
                _lib = load()
        except Exception:
            _build_failed = True
            return None
    return _lib


def encode_png(arr: np.ndarray, level: int = 2):
    """(H, W, 3) uint8 -> PNG bytes via the native encoder, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3, "RGB8 only"
    cap = w * h * 3 + (h + 4096)
    out = np.empty(cap, np.uint8)
    n = lib.png_encode_rgb8(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, level,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:  # buffer too small: retry at exact size
        cap = -n
        out = np.empty(cap, np.uint8)
        n = lib.png_encode_rgb8(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, level,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n <= 0:
        return None
    return out[:n].tobytes()


def native_available() -> bool:
    return _load() is not None
