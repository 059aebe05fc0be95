"""ctypes bindings for the native host-ops library (cpp/host_ops.cpp).

Auto-builds `libcnmgp_host.so` with the repo Makefile on first use and
falls back to NumPy implementations when no compiler is available, so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "semivariogram",
    "semivariogram_multi",
    "windowed_scatter_cov",
    "knn_1d",
]

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libcnmgp_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _CPP_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    dptr = ctypes.POINTER(ctypes.c_double)
    iptr = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.semivariogram.argtypes = [dptr, dptr, i64, dptr, dptr]
    lib.semivariogram_multi.argtypes = [dptr, dptr, i64, i64, dptr, dptr]
    lib.windowed_scatter_cov.argtypes = [dptr, i64, i64, i64, dptr]
    lib.knn_1d.argtypes = [dptr, i64, dptr, i64, i64, iptr]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def semivariogram(x, y) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs semivariogram of one series: returns (lag, sv)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    n = x.shape[0]
    npairs = n * (n - 1) // 2
    lib = _load()
    if lib is None:
        iu, ju = np.triu_indices(n, k=1)
        return x[ju] - x[iu], 0.5 * (y[ju] - y[iu]) ** 2
    lag = np.empty(npairs)
    sv = np.empty(npairs)
    lib.semivariogram(_dp(x), _dp(y), n, _dp(lag), _dp(sv))
    return lag, sv


def semivariogram_multi(x, Y) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs semivariograms for every column of Y: (lag, sv (m, P))."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    Y = np.ascontiguousarray(Y, dtype=np.float64)
    n, m = Y.shape
    npairs = n * (n - 1) // 2
    lib = _load()
    if lib is None:
        iu, ju = np.triu_indices(n, k=1)
        return x[ju] - x[iu], (0.5 * (Y[ju] - Y[iu]) ** 2).T
    lag = np.empty(npairs)
    sv = np.empty((m, npairs))
    lib.semivariogram_multi(_dp(x), _dp(Y), n, m, _dp(lag), _dp(sv))
    return lag, sv


def windowed_scatter_cov(Y, window: int) -> np.ndarray:
    """Per-point windowed scatter covariances, (n, m, m)."""
    Y = np.ascontiguousarray(Y, dtype=np.float64)
    n, m = Y.shape
    lib = _load()
    if lib is None:
        out = np.empty((n, m, m))
        for p in range(n):
            s = max(0, p - window)
            e = min(p + window, n - 1)
            seg = Y[s:e]
            out[p] = seg.T @ seg / max(seg.shape[0] - 1, 1)
        return out
    out = np.empty((n, m, m))
    lib.windowed_scatter_cov(_dp(Y), n, m, window, _dp(out))
    return out


def knn_1d(x, z, k: int) -> np.ndarray:
    """Indices of the k nearest x to each z, (nz, k)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    z = np.ascontiguousarray(z, dtype=np.float64)
    lib = _load()
    if lib is None:
        return np.stack([np.argsort(np.abs(x - zq), kind="stable")[:k] for zq in z])
    out = np.empty((z.shape[0], k), dtype=np.int64)
    lib.knn_1d(_dp(x), x.shape[0], _dp(z), z.shape[0], k,
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
