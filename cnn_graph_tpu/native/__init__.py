"""Native host kernels: build-on-demand C++ with ctypes bindings.

``lib()`` compiles ``graph_kernels.cpp`` once per interpreter (cached as a
shared object next to the source) and returns the ctypes handle, or None
when no compiler is available — callers fall back to the NumPy/Python
implementations in graphs/coarsening.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["lib", "graclus_one_level_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_kernels.cpp")
_SO = os.path.join(_HERE, "libgraph_kernels.so")
_lock = threading.Lock()
_lib = None
_tried = False


def lib():
    """Compile (if needed) and load the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            _lib = ctypes.CDLL(_SO)
            _lib.graclus_one_level.restype = ctypes.c_int64
        except (OSError, subprocess.CalledProcessError):
            _lib = None
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def graclus_one_level_native(indptr, indices, data, rid, weights):
    """Native Graclus matching; returns cluster ids or None if the native
    library is unavailable."""
    L = lib()
    if L is None:
        return None
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float64)
    rid = np.ascontiguousarray(rid, np.int64)
    weights = np.ascontiguousarray(weights, np.float64)
    cluster = np.empty(n, np.int32)
    L.graclus_one_level(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(data, ctypes.c_double), _ptr(rid, ctypes.c_int64),
        _ptr(weights, ctypes.c_double), ctypes.c_int64(n),
        _ptr(cluster, ctypes.c_int32),
    )
    return cluster
