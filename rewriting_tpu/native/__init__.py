"""Native (C++) runtime components, loaded via ctypes with pure-Python
fallbacks.

Currently: a fast zlib-based PNG encoder for the metric pipelines' bulk
image dumps (pngenc.cpp) and a matching decoder for their bulk reads
(pngdec.cpp; baseline 8-bit grey/RGB/RGBA).  Built lazily with g++ on
first use; callers must handle None returns (PIL fallback)."""

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


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_DEC_SO = os.path.join(_DIR, "_pngdec.so")
_DEC_SRC = os.path.join(_DIR, "pngdec.cpp")
_dec_lib = None
_dec_failed = False


def _load_dec():
    global _dec_lib, _dec_failed
    if _dec_lib is not None or _dec_failed:
        return _dec_lib
    with _lock:
        if _dec_lib is not None or _dec_failed:
            return _dec_lib

        def build():
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _DEC_SRC, "-lz",
                 "-o", _DEC_SO + ".tmp"],
                check=True, capture_output=True)
            os.replace(_DEC_SO + ".tmp", _DEC_SO)

        def load():
            lib = ctypes.CDLL(_DEC_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int)
            lib.png_get_info.restype = ctypes.c_int
            lib.png_get_info.argtypes = [u8p, ctypes.c_long, i32p, i32p,
                                         i32p]
            lib.png_decode_rgb8.restype = ctypes.c_int
            lib.png_decode_rgb8.argtypes = [u8p, ctypes.c_long, u8p]
            return lib

        try:
            if not os.path.exists(_DEC_SO) or (
                    os.path.getmtime(_DEC_SO) < os.path.getmtime(_DEC_SRC)):
                build()
            try:
                _dec_lib = load()
            except OSError:
                build()
                _dec_lib = load()
        except Exception:
            _dec_failed = True
            return None
    return _dec_lib


def decode_png(data: bytes):
    """PNG bytes -> (H, W, 3) uint8 RGB array via the native decoder, or
    None when the format needs PIL (palette, 16-bit, interlaced, ...) or
    the library is unavailable."""
    lib = _load_dec()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    if lib.png_get_info(buf.ctypes.data_as(u8p), len(data),
                        ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.png_decode_rgb8(buf.ctypes.data_as(u8p), len(data),
                           out.ctypes.data_as(u8p)) != 0:
        return None
    return out


def read_image_rgb(path: str):
    """Read an image file to (H, W, 3) uint8, native-decoding PNGs and
    falling back to PIL for anything else."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        out = decode_png(data)
        if out is not None:
            return out
    import io
    import PIL.Image
    return np.asarray(PIL.Image.open(io.BytesIO(data)).convert("RGB"))


def read_batches(paths, batch_size: int, workers: int = None,
                 readahead: int = 2):
    """Yield (B, H, W, 3) uint8 batches of the given image files, decoded
    by a THREAD pool with a bounded readahead window.  The ctypes decode
    call releases the GIL, so two distinct wins compose:
    - multi-core hosts inflate PNGs truly in parallel (workers scale);
    - even on ONE core, readahead decode overlaps the time the consumer
      spends blocked in device upload/fetch (GIL released there too) —
      measured 1.8x on this image's single-CPU host with a blocking
      consumer, decode fully hidden.
    Order is preserved; the final batch carries the remainder (may be
    smaller than batch_size).

    This is the host-side half of the streaming metric drivers
    (metrics/seg_stats, metrics/fid, bench 10k pipeline): main-thread
    decode at ~2 ms/img was their measured bottleneck once transfers
    went uint8 (docs/PERF_NOTES.md round 3)."""
    import concurrent.futures as cf
    from collections import deque
    paths = list(paths)
    if not paths:
        return
    if workers is None:
        workers = min(8, os.cpu_count() or 1)
    window = max(batch_size * (readahead + 1), workers)
    with cf.ThreadPoolExecutor(workers) as ex:
        futs = deque(ex.submit(read_image_rgb, p)
                     for p in paths[:window])
        nxt = window
        batch = []
        while futs:
            batch.append(futs.popleft().result())
            if nxt < len(paths):
                futs.append(ex.submit(read_image_rgb, paths[nxt]))
                nxt += 1
            if len(batch) == batch_size or not futs:
                yield np.stack(batch)
                batch = []
