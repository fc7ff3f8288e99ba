"""Minimal Wavefront OBJ loader (v / f records, fan triangulation).

Capability match for the tinyobjloader wrapper
(src/tinyobj_loader_wrapper.cu, used by sng::VirtualObject at
virtual_object.cu:42-88): returns a flat (T, 3, 3) float32 triangle
array. Negative indices and v/vt/vn face syntax are handled; materials
come from the scene JSON (like the reference's virtual objects), not MTL.
"""
from __future__ import annotations

import numpy as np


def load_obj(path: str) -> np.ndarray:
    """Returns triangles (T, 3, 3) float32 — [tri][vertex][xyz].

    Uses the native C++ parser (native/geometry.cpp) when built; pure
    Python otherwise."""
    from .native import load_obj_native

    native = load_obj_native(path)
    if native is not None:
        return native
    return _load_obj_py(path)


def _load_obj_py(path: str) -> np.ndarray:
    verts: list[list[float]] = []
    faces: list[tuple[int, int, int]] = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    s = tok.split("/")[0]
                    i = int(s)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))
    v = np.asarray(verts, np.float32)
    f_arr = np.asarray(faces, np.int64)
    return v[f_arr]
