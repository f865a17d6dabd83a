"""ctypes binding to the native OBJ tokenizer (native/obj_parser.cpp).

Same auto-compile-and-cache scheme as the native BVH builder
(:mod:`bifrost3d_tpu.geometry.native`). Returns raw parsed arrays; the
grouping/material conversion stays in :mod:`bifrost3d_tpu.io.obj` so the
native and Python paths share all policy code (a parity test holds the two
tokenizers together).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "obj_parser.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libobj_parser.so")

_LIB = None
_TRIED = False

_ip = ctypes.POINTER(ctypes.c_int)


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
        lib.bifrost_obj_parse.restype = ctypes.c_int
        lib.bifrost_obj_parse.argtypes = [
            ctypes.c_char_p, _ip, _ip, _ip, _ip, _ip, _ip, _ip]
        lib.bifrost_obj_fetch.restype = ctypes.c_int
        lib.bifrost_obj_fetch.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_char_p]
        lib.bifrost_obj_free.restype = ctypes.c_int
        lib.bifrost_obj_free.argtypes = [ctypes.c_int]
        _LIB = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        warnings.warn(f"native OBJ parser unavailable ({e}); using Python")
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def parse_obj_native(path: str):
    """→ dict with positions [P,3], normals [N,3] or None, uvs [U,2] or
    None, tri_corners [T,3,3] int32 (pos/uv/normal, -1 = absent),
    tri_material [T] int32 (-1 = before any usemtl), material_names
    [str...], mtllib str. Returns None if the native library is missing."""
    lib = _load()
    if lib is None:
        return None
    counts = [ctypes.c_int(0) for _ in range(7)]
    handle = lib.bifrost_obj_parse(
        path.encode("utf-8"), *[ctypes.byref(c) for c in counts])
    if handle < 0:
        raise FileNotFoundError(path)
    n_pos, n_n, n_uv, n_tri, n_mat, names_len, mtllib_len = \
        [c.value for c in counts]
    positions = np.empty((max(n_pos, 1), 3), np.float32)
    normals = np.empty((max(n_n, 1), 3), np.float32)
    uvs = np.empty((max(n_uv, 1), 2), np.float32)
    tri_corners = np.empty((max(n_tri, 1), 3, 3), np.int32)
    tri_material = np.empty((max(n_tri, 1),), np.int32)
    names_buf = ctypes.create_string_buffer(max(names_len, 1))
    mtllib_buf = ctypes.create_string_buffer(max(mtllib_len, 1))
    rc = lib.bifrost_obj_fetch(
        handle,
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tri_corners.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        tri_material.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        names_buf, mtllib_buf)
    lib.bifrost_obj_free(handle)
    if rc != 0:
        raise RuntimeError(f"native OBJ fetch failed for {path}")
    names = names_buf.raw[:names_len].decode("utf-8").split("\n")[:-1] \
        if names_len else []
    return dict(
        positions=positions[:n_pos],
        normals=normals[:n_n] if n_n else None,
        uvs=uvs[:n_uv] if n_uv else None,
        tri_corners=tri_corners[:n_tri],
        tri_material=tri_material[:n_tri],
        material_names=names,
        mtllib=mtllib_buf.raw[:mtllib_len].decode("utf-8") if mtllib_len else "",
    )
