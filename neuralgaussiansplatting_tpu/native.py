"""ctypes loader for the native host-runtime library (native/ngs_native.cpp).

Builds on demand with the repo Makefile (g++) and memoizes; every entry point
has a pure-Python fallback so the framework works without a toolchain. See
native/ngs_native.cpp for what is native and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_NATIVE_DIR, "libngs_native.so")
        if not os.path.exists(so):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.colmap_points3d_count.restype = ctypes.c_longlong
        lib.colmap_points3d_count.argtypes = [ctypes.c_char_p]
        lib.colmap_points3d_read.restype = ctypes.c_longlong
        lib.colmap_points3d_read.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.knn_mean_dist3.restype = ctypes.c_int
        lib.knn_mean_dist3.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def read_points3d_binary(path: str):
    """Native bulk parse of COLMAP points3D.bin; returns (xyz, rgb, err) or
    None when the native library is unavailable (callers fall back)."""
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_points3d_count(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    got = lib.colmap_points3d_read(path.encode(), xyz, rgb, err)
    if got != n:
        return None
    return xyz, rgb, err


def knn_mean_dist3(points: np.ndarray, num_threads: int = 0):
    """Native approximate 3-NN mean squared distance (simple-knn algorithm);
    None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    if lib.knn_mean_dist3(pts, len(pts), out, num_threads) != 0:
        return None
    return out
