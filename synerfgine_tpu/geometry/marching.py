"""Isosurface extraction (marching tetrahedra) + NeRF mesh export.

Capability match for marching_cubes.h/.cu (N19 in SURVEY.md §2:
`marching_cubes_gpu`, density->mesh export with dir-conditioned vertex
colors, testbed.cu:505). The cube-based tables are replaced by a
6-tetrahedra decomposition whose 16 sign cases are DERIVED
programmatically at import time (no lookup-table transcription); output
meshes are capability-equivalent (watertight isosurface at the chosen
density threshold).

Host-side numpy: mesh export is an offline operation in the reference
too; the density lattice itself is evaluated on-device in chunks.
"""
from __future__ import annotations

import numpy as np

# cube corner offsets, index = x + 2y + 4z
_CUBE = np.array([
    [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
    [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
], np.int64)

# 6-tet decomposition of the cube around the 0-7 diagonal
_TETS = np.array([
    [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
    [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7],
], np.int64)

_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _build_cases():
    """For each of 16 inside-masks over a tet's 4 verts, the list of
    triangles as triples of edge indices into _EDGES."""
    cases = []
    for mask in range(16):
        inside = [bool(mask >> i & 1) for i in range(4)]
        n_in = sum(inside)
        crossing = [e for e, (a, b) in enumerate(_EDGES)
                    if inside[a] != inside[b]]
        if n_in in (0, 4):
            cases.append([])
        elif n_in in (1, 3):
            # single vertex separated: 3 crossing edges -> one triangle
            lone = inside.index(True) if n_in == 1 else inside.index(False)
            tri = [e for e in crossing if lone in _EDGES[e]]
            cases.append([tri])
        else:
            # 2-2 split: 4 crossing edges form a quad -> two triangles.
            # Order the quad so consecutive edges share a tet face.
            quad = crossing[:]
            ordered = [quad.pop(0)]
            while quad:
                last = set(_EDGES[ordered[-1]])
                for e in quad:
                    if last & set(_EDGES[e]):
                        ordered.append(e)
                        quad.remove(e)
                        break
                else:  # disconnected (cannot happen for a tet)
                    ordered.append(quad.pop(0))
            cases.append([[ordered[0], ordered[1], ordered[2]],
                          [ordered[0], ordered[2], ordered[3]]])
    return cases


_CASES = _build_cases()


def marching_tetrahedra(
    values: np.ndarray,       # (X, Y, Z) scalar field
    level: float,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
):
    """Extract the `values == level` isosurface. Returns
    (verts (V, 3) float32, faces (F, 3) int64). 'Inside' = value > level
    (density above threshold); triangles are oriented with normals
    pointing outward (toward decreasing density)."""
    values = np.asarray(values, np.float32)
    X, Y, Z = values.shape
    origin = np.asarray(origin, np.float32)
    spacing = np.asarray(spacing, np.float32)

    cx, cy, cz = np.meshgrid(
        np.arange(X - 1), np.arange(Y - 1), np.arange(Z - 1), indexing="ij"
    )
    cells = np.stack([cx, cy, cz], -1).reshape(-1, 3)       # (C, 3)
    corner_pos = cells[:, None, :] + _CUBE[None]             # (C, 8, 3)
    corner_val = values[
        corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]
    ]                                                        # (C, 8)

    verts_out = []
    for tet in _TETS:
        v = corner_val[:, tet]                               # (C, 4)
        p = corner_pos[:, tet].astype(np.float32)            # (C, 4, 3)
        inside = v > level
        mask = (inside * (1 << np.arange(4))).sum(-1)        # (C,)
        for case_id in range(1, 15):
            tris = _CASES[case_id]
            if not tris:
                continue
            sel = np.nonzero(mask == case_id)[0]
            if len(sel) == 0:
                continue
            vv, pp = v[sel], p[sel]
            # interpolated point on each tet edge
            edge_pts = {}
            for e, (a, b) in enumerate(_EDGES):
                va, vb = vv[:, a], vv[:, b]
                t = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
                t = np.clip(t, 0.0, 1.0)
                edge_pts[e] = pp[:, a] + t[:, None] * (pp[:, b] - pp[:, a])
            inside_centroid = (pp * (vv > level)[..., None]).sum(1) / np.maximum(
                (vv > level).sum(1)[:, None], 1)
            for tri in tris:
                a, b, c = (edge_pts[tri[0]], edge_pts[tri[1]], edge_pts[tri[2]])
                n = np.cross(b - a, c - a)
                centroid = (a + b + c) / 3
                flip = (n * (inside_centroid - centroid)).sum(-1) > 0
                b2 = np.where(flip[:, None], c, b)
                c2 = np.where(flip[:, None], b, c)
                verts_out.append(np.stack([a, b2, c2], axis=1))

    if not verts_out:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    tris = np.concatenate(verts_out)                         # (F, 3, 3)
    flat = tris.reshape(-1, 3)
    # weld duplicate vertices
    key = np.round(flat / 1e-5).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float64)
    np.add.at(verts, inv, flat)
    counts = np.bincount(inv, minlength=len(uniq))[:, None]
    verts = (verts / counts).astype(np.float32)
    faces = inv.reshape(-1, 3)
    verts = verts * spacing + origin
    return verts, faces


def extract_nerf_mesh(
    network,
    params,
    resolution: int = 128,
    threshold: float = 2.5,
    aabb_lo=(0.0, 0.0, 0.0),
    aabb_hi=(1.0, 1.0, 1.0),
    chunk: int = 1 << 16,
    with_colors: bool = True,
):
    """Evaluate the density field on a lattice and extract a colored mesh
    (`compute_marching_cubes_mesh` parity: threshold on exp-activated
    density; vertex colors from a network query along the normal)."""
    import jax
    import jax.numpy as jnp

    from ..nn.nerf_network import density_activation

    lo = np.asarray(aabb_lo, np.float32)
    hi = np.asarray(aabb_hi, np.float32)
    g = np.linspace(0.0, 1.0, resolution, dtype=np.float32)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)

    # aligned-pair table built once, not per chunk
    paired_tbl = jax.jit(network.pos_encoding.make_paired_table)(
        params.hash_table)
    dens_fn = jax.jit(lambda p, pt, x: density_activation(
        network.density(p, x, paired_table=pt)[:, 0]))
    vals = []
    for i in range(0, len(pts), chunk):
        vals.append(np.asarray(dens_fn(params, paired_tbl,
                                       jnp.asarray(pts[i:i + chunk]))))
    field = np.concatenate(vals).reshape(resolution, resolution, resolution)

    sp = 1.0 / (resolution - 1)
    verts, faces = marching_tetrahedra(field, threshold, origin=(0, 0, 0),
                                       spacing=(sp, sp, sp))
    colors = None
    if with_colors and len(verts):
        # vertex normals from face normals
        fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                      verts[faces[:, 2]] - verts[faces[:, 0]])
        vn = np.zeros_like(verts)
        for k in range(3):
            np.add.at(vn, faces[:, k], fn)
        vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
        col_fn = jax.jit(
            lambda p, pt, x, d: jax.nn.sigmoid(
                network.forward(p, x, (d + 1) * 0.5,
                                paired_table=pt)[:, :3].astype(jnp.float32))
        )
        cols = []
        for i in range(0, len(verts), chunk):
            cols.append(np.asarray(col_fn(
                params, paired_tbl, jnp.asarray(verts[i:i + chunk]),
                jnp.asarray(-vn[i:i + chunk]))))
        colors = np.concatenate(cols)
    # map unit coords to world aabb
    verts_world = verts * (hi - lo) + lo
    return verts_world, faces, colors


def save_mesh_obj(path: str, verts: np.ndarray, faces: np.ndarray,
                  colors: np.ndarray | None = None):
    """OBJ export (vertex colors as the common nonstandard v-extension)."""
    with open(path, "w") as f:
        for i, v in enumerate(verts):
            if colors is not None:
                c = colors[i]
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
