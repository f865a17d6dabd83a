"""ctypes binding to the native C++ BVH builder (native/bvh_builder.cpp).

Compiles the shared library on first use (g++ -O2, cached next to the
source); falls back silently to the numpy builder when no compiler is
available. The native builder produces bit-identical layout semantics
(depth-first flattening, left child = parent + 1) so the two are
interchangeable — the parity test in tests/test_geometry.py holds them
together.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "bvh_builder.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libbvh_builder.so")

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bifrost_build_bvh.restype = ctypes.c_int
        lib.bifrost_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        warnings.warn(f"native BVH builder unavailable ({e}); using numpy")
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_bvh_native(tri_min: np.ndarray, tri_max: np.ndarray,
                     max_leaf: int = 4):
    """→ (node_min, node_max, node_a, node_count, prim_order) numpy arrays,
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = tri_min.shape[0]
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    cap = max(2 * t, 2)
    node_min = np.zeros((cap, 3), np.float32)
    node_max = np.zeros((cap, 3), np.float32)
    node_a = np.zeros(cap, np.int32)
    node_count = np.zeros(cap, np.int32)
    prim_order = np.zeros(t, np.int32)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    n = lib.bifrost_build_bvh(
        ptr(tri_min, ctypes.c_float), ptr(tri_max, ctypes.c_float),
        t, max_leaf,
        ptr(node_min, ctypes.c_float), ptr(node_max, ctypes.c_float),
        ptr(node_a, ctypes.c_int32), ptr(node_count, ctypes.c_int32),
        ptr(prim_order, ctypes.c_int32))
    return (node_min[:n], node_max[:n], node_a[:n], node_count[:n], prim_order)
