"""ctypes bindings for the native geometry runtime (native/geometry.cpp).

Provides C++ OBJ parsing and BVH construction (the components the
reference keeps native: tinyobjloader + TriangleBvh::build). Builds the
shared library on first use if g++ is available; callers fall back to the
numpy implementations when the library can't be built.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsynerfgeom.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.sg_obj_count.argtypes = [ctypes.c_char_p]
        lib.sg_obj_count.restype = ctypes.c_int
        lib.sg_obj_load.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.sg_obj_load.restype = ctypes.c_int
        lib.sg_bvh_build.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.sg_bvh_build.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_obj_native(path: str) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    n = lib.sg_obj_count(str(path).encode())
    if n < 0:
        return None
    out = np.empty((max(n, 1), 9), np.float32)
    got = lib.sg_obj_load(str(path).encode(), out, n)
    if got < 0:
        return None
    return out[:got].reshape(got, 3, 3)


def bvh_build_native(tris: np.ndarray, leaf_size: int = 4):
    """Returns dict(lo, hi, left, right, first, count, order) or None."""
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, np.float32)
    n = len(tris)
    cap = max(2 * n, 4)
    lo = np.empty((cap, 3), np.float32)
    hi = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    order = np.empty(max(n, 1), np.int64)
    n_nodes = lib.sg_bvh_build(tris.reshape(n, 9), n, leaf_size, lo, hi,
                               left, right, first, count, order, cap)
    if n_nodes < 0:
        return None
    return {
        "lo": lo[:n_nodes], "hi": hi[:n_nodes], "left": left[:n_nodes],
        "right": right[:n_nodes], "first": first[:n_nodes],
        "count": count[:n_nodes], "order": order[:n],
    }
