"""ctypes bindings for the native C++ components (csrc/).

The shared library is compiled on demand with g++ if the checked-in .so is
missing or stale (source newer than binary).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE.parent.parent / "csrc" / "amg.cpp"
_LIB = _HERE / "libamg.so"


def _ensure_built() -> Path:
    if not _LIB.exists() or (
        _SRC.exists() and _SRC.stat().st_mtime > _LIB.stat().st_mtime
    ):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)]
        )
    return _LIB


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        L = ctypes.CDLL(str(_ensure_built()))
        L.amg_setup.restype = ctypes.c_void_p
        L.amg_setup.argtypes = [
            ctypes.c_int, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ]
        L.amg_refresh.argtypes = [
            ctypes.c_void_p, np.ctypeslib.ndpointer(np.float64)
        ]
        L.amg_num_levels.restype = ctypes.c_int
        L.amg_num_levels.argtypes = [ctypes.c_void_p]
        L.amg_level_dims.argtypes = [
            ctypes.c_void_p, ctypes.c_int, np.ctypeslib.ndpointer(np.int64)
        ]
        L.amg_get_matrix.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
        ]
        L.amg_get_prolongator.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
        ]
        L.amg_coarse_dense.argtypes = [
            ctypes.c_void_p, np.ctypeslib.ndpointer(np.float64)
        ]
        L.amg_free.argtypes = [ctypes.c_void_p]
        _lib = L
    return _lib
