"""ctypes bindings for the native host runtime (liblira_native.so).

Builds lazily with `make` on first use if the shared library is missing;
every entry point has a pure-numpy fallback so the framework works without
a compiler.  `available()` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "liblira_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # (re)build when the library is missing OR older than its source.  The
    # .so is never committed (-march=native binaries from another machine
    # can SIGILL on this one — a signal the numpy fallbacks cannot catch)
    src = os.path.join(_HERE, "lira_native.cpp")
    stale = not os.path.exists(_SO) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_SO)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-s", "-C", _HERE], check=True, capture_output=True, timeout=120
            )
        except Exception:
            if not os.path.exists(_SO):
                return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.csr_count.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i64p]
    lib.csr_fill.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i64p, i32p]
    lib.probe_tile_counts.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, i64p, i64p]
    lib.probe_tile_fill.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int32, i64p, i64p, ctypes.c_int64, i32p,
    ]
    lib.xvecs_strip_headers_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, f32p]
    lib.bvecs_to_f32.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, f32p]
    lib.lira_native_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_csr(d2b: np.ndarray, n_bkt: int) -> tuple[np.ndarray, np.ndarray]:
    """(offsets (n_bkt+1) int64, ids (total) int32) — sorted+dedup per bucket."""
    d2b = np.ascontiguousarray(d2b, dtype=np.int32)
    if d2b.ndim == 1:
        d2b = d2b[:, None]
    n, n_mul = d2b.shape
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    counts = np.zeros(n_bkt, dtype=np.int64)
    lib.csr_count(d2b, n, n_mul, n_bkt, counts)
    offsets = np.zeros(n_bkt + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    ids = np.empty(int(offsets[-1]), dtype=np.int32)
    lib.csr_fill(d2b, n, n_mul, n_bkt, np.ascontiguousarray(offsets[:-1]), ids)
    return offsets, ids


def probe_tiles(
    probed: np.ndarray, tile_start: np.ndarray, tiles_per_bucket: np.ndarray
) -> np.ndarray:
    """(B, T) int32 probed-tile lists (−1 padded), T = pow2 ceil of the max count."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    probed = np.ascontiguousarray(probed, dtype=np.uint8)
    B, n_bkt = probed.shape
    ts = np.ascontiguousarray(tile_start, dtype=np.int64)
    tpb = np.ascontiguousarray(tiles_per_bucket, dtype=np.int64)
    counts = np.empty(B, dtype=np.int64)
    lib.probe_tile_counts(probed, B, n_bkt, tpb, counts)
    t_max = max(int(counts.max()), 1)
    T = 1 << (t_max - 1).bit_length()
    out = np.full((B, T), -1, dtype=np.int32)
    lib.probe_tile_fill(probed, B, n_bkt, ts, tpb, T, out)
    return out


def fvecs_rows(raw_f32: np.ndarray, n: int, dim: int) -> np.ndarray:
    """Strip per-record dim headers from an fvecs buffer into (n, dim) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty((n, dim), dtype=np.float32)
    lib.xvecs_strip_headers_f32(np.ascontiguousarray(raw_f32, np.float32), n, dim, out)
    return out


def bvecs_rows(raw_u8: np.ndarray, n: int, dim: int) -> np.ndarray:
    """Widen a bvecs buffer to (n, dim) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty((n, dim), dtype=np.float32)
    lib.bvecs_to_f32(np.ascontiguousarray(raw_u8, np.uint8), n, dim, out)
    return out
