"""Native (C++) runtime components, loaded via ctypes.

The reference ships two CUDA extensions (diff-surfel-rasterization and
simple-knn); the TPU compute path replaces the first with Pallas kernels,
and this package holds the host-native pieces: a Morton-ordered
multithreaded KNN (simple-knn's role) built with g++ at first use and
cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None


def _build_library() -> str:
    src = os.path.join(_DIR, "knn.cpp")
    out = os.path.join(_DIR, "_tpu2dgs_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_library())
            lib.knn_mean_dist2.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ]
            lib.knn_mean_dist2.restype = None
            _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def knn_mean_dist2(points: np.ndarray, window: int = 16,
                   threads: int = 0) -> np.ndarray:
    """(N,3) float32 -> (N,) approximate mean squared 3-NN distance."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    lib.knn_mean_dist2(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        window, threads,
    )
    return out
