"""Native (C++) runtime components, built lazily with g++ and loaded via
ctypes; every entry point has a pure-Python fallback so the package works
without a toolchain."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "colmap_reader.cpp")
        so = os.path.join(here, "libgsl_native.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.colmap_count_points3d.restype = ctypes.c_int64
            lib.colmap_count_points3d.argtypes = [ctypes.c_char_p]
            lib.colmap_read_points3d.restype = ctypes.c_int64
            lib.colmap_read_points3d.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def read_points3d_native(path: str
                         ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]]:
    """points3D.bin -> (xyz [n,3] f64, rgb [n,3] u8, err [n] f64), or None
    if the native library is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = lib.colmap_count_points3d(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    got = lib.colmap_read_points3d(path.encode(), xyz, rgb, err)
    if got != n:
        return None
    return xyz, rgb, err
