"""ctypes bindings for the native (C++) data runtime.

Builds native/libtgpdata.so on first use (g++, no pybind11 needed) and
falls back to pandas/numpy transparently when the toolchain is missing.
Used for mmap'd multithreaded CSV parsing and fused shuffle-gather on the
large corpora; parity-sensitive UCI paths keep numpy's seeded generator.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtgpdata.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = os.path.join(_NATIVE_DIR, "tgpdata.cc")
        stale = (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
        if stale:
            # rebuild whenever the source is newer than the library — a
            # stale or foreign-arch binary must never be silently loaded
            subprocess.run(["make", "-C", _NATIVE_DIR, "-sB"], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tgp_csv_shape.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.tgp_csv_shape.restype = ctypes.c_int
        lib.tgp_csv_parse.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                      ctypes.c_int, ctypes.c_void_p,
                                      ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int]
        lib.tgp_csv_parse.restype = ctypes.c_int
        lib.tgp_permutation.argtypes = [ctypes.c_int64, ctypes.c_uint64,
                                        ctypes.c_void_p]
        lib.tgp_gather_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_void_p]
        lib.tgp_gather_rows_f32.argtypes = lib.tgp_gather_rows.argtypes
        lib.tgp_zscore.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_csv(path: str, sep: str = ",", ws_mode: bool = False,
             n_threads: int = 0) -> np.ndarray | None:
    """mmap + multithreaded CSV parse -> (rows, cols) float64, or None."""
    lib = _load()
    if lib is None or len(sep) != 1:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.tgp_csv_shape(path.encode(), sep.encode(), int(ws_mode),
                           ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    rc = lib.tgp_csv_parse(path.encode(), sep.encode(), int(ws_mode),
                           out.ctypes.data_as(ctypes.c_void_p),
                           rows.value, cols.value, n_threads)
    if rc != 0:
        return None
    return out


def permutation(n: int, seed: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(n, dtype=np.int64)
    lib.tgp_permutation(n, seed, out.ctypes.data_as(ctypes.c_void_p))
    return out


def gather_rows(data: np.ndarray, perm: np.ndarray, start: int, batch: int,
                out_dtype=np.float64) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    rows, cols = data.shape
    if out_dtype == np.float32:
        out = np.empty((batch, cols), dtype=np.float32)
        lib.tgp_gather_rows_f32(data.ctypes.data_as(ctypes.c_void_p), cols,
                                perm.ctypes.data_as(ctypes.c_void_p), start,
                                batch, out.ctypes.data_as(ctypes.c_void_p))
    else:
        out = np.empty((batch, cols), dtype=np.float64)
        lib.tgp_gather_rows(data.ctypes.data_as(ctypes.c_void_p), cols,
                            perm.ctypes.data_as(ctypes.c_void_p), start,
                            batch, out.ctypes.data_as(ctypes.c_void_p))
    return out
