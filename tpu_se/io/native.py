"""ctypes bindings for the native chunk loader (native/chunk_loader.cc).

The native path mirrors the reference's C++ host data engine
(``Interface.cc:719-838``); the numpy implementations in
``tpu_se.data.dataset`` remain the fallback and the oracle.  Loading is
lazy and optional: ``available()`` is False when the .so hasn't been built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libtpuse_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i64, f32p, i32p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                       ctypes.POINTER(ctypes.c_int32))
    lib.tpuse_read_chunk_normalized.restype = ctypes.c_int
    lib.tpuse_read_chunk_normalized.argtypes = [
        ctypes.c_char_p, i64, i64, i64, i64, f32p, f32p, f32p]
    lib.tpuse_splice_scatter.restype = None
    lib.tpuse_splice_scatter.argtypes = [f32p, i64, i32p, i32p, i64, i64, f32p]
    lib.tpuse_gather_targets.restype = None
    lib.tpuse_gather_targets.argtypes = [f32p, i64, i32p, i32p, i64, i64, f32p]
    lib.tpuse_bswap_f32.restype = None
    lib.tpuse_bswap_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), i64, f32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray | None):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def read_chunk_normalized(path, header_size: int, dim: int, frame_lo: int,
                          frame_hi: int, mean: np.ndarray,
                          inv_std: np.ndarray) -> np.ndarray:
    """Native pread + byte-swap + Z-score of pfile rows [frame_lo, frame_hi)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    n = frame_hi - frame_lo
    out = np.empty((n, dim), dtype=np.float32)
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    inv_std = np.ascontiguousarray(inv_std, dtype=np.float32)
    rc = lib.tpuse_read_chunk_normalized(
        str(path).encode(), header_size, dim, frame_lo, frame_hi,
        _fp(mean), _fp(inv_std), _fp(out))
    if rc != 0:
        raise IOError(f"native chunk read failed (rc={rc}) for {path}")
    return out


def splice_scatter(frames: np.ndarray, starts: np.ndarray,
                   scatter: np.ndarray | None, context: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    starts = np.ascontiguousarray(starts, dtype=np.int32)
    scatter = (np.ascontiguousarray(scatter, dtype=np.int32)
               if scatter is not None else None)
    n, dim = len(starts), frames.shape[1]
    out = np.empty((n, context * dim), dtype=np.float32)
    lib.tpuse_splice_scatter(_fp(frames), dim, _ip(starts), _ip(scatter),
                             n, context, _fp(out))
    return out


def gather_targets(frames: np.ndarray, starts: np.ndarray,
                   scatter: np.ndarray | None, offset: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    starts = np.ascontiguousarray(starts, dtype=np.int32)
    scatter = (np.ascontiguousarray(scatter, dtype=np.int32)
               if scatter is not None else None)
    n, dim = len(starts), frames.shape[1]
    out = np.empty((n, dim), dtype=np.float32)
    lib.tpuse_gather_targets(_fp(frames), dim, _ip(starts), _ip(scatter),
                             n, offset, _fp(out))
    return out
