"""Native (C++) runtime components, built lazily with g++ and bound via
ctypes (pybind11 is not in this image).

Currently: liblap.so — rectangular linear sum assignment (lap.cpp), used by
the host Hungarian matcher in preference to per-sample scipy calls.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> Optional[str]:
    src = os.path.join(_DIR, "lap.cpp")
    out = os.path.join(_DIR, "liblap.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
                       check=True, capture_output=True)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lap_lib() -> Optional[ctypes.CDLL]:
    """The compiled LAP library, or None if unavailable (callers fall back
    to scipy)."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _build()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        lib.solve_lap.restype = ctypes.c_int
        lib.solve_lap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.solve_lap_batched.restype = ctypes.c_int
        lib.solve_lap_batched.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _LIB = lib
        return _LIB


def lap_batched(cost: np.ndarray, n_valid: np.ndarray) -> Optional[np.ndarray]:
    """cost: (B, R, C) float32, rows=GTs (R <= C); n_valid: (B,) int.

    Returns (B, R) matched column per row (-1 for invalid rows), or None if
    the native lib is unavailable.
    """
    lib = get_lap_lib()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float32)
    b, r, c = cost.shape
    nv = np.ascontiguousarray(n_valid, np.int32)
    out = np.empty((b, r), np.int32)
    rc = lib.solve_lap_batched(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, r, c,
        nv.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        return None
    return out
