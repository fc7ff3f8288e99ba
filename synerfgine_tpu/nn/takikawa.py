"""Takikawa (NGLOD-style) surface-octree feature encoding.

Capability match for `TakikawaEncoding` + `TriangleOctree` (N11:
include/neural-graphics-primitives/takikawa_encoding.cuh,
triangle_octree.cuh — the SDF mode's octree alternative to the hash grid,
configs/sdf/takikawa.json): features live only at the corners of octree
cells that intersect the mesh surface; a query trilinearly interpolates
the corner features of its containing cell at every level and sums the
levels; points outside the surface octree contribute zeros.

TPU design: each level keeps a dense int32 corner-index volume
(res+1)^3 -> slot into a compact feature table (-1 outside). Queries are
plain gathers (no pointer-chasing octree traversal); the host build
voxelizes triangles conservatively per level (numpy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _voxelize_surface(tris: np.ndarray, res: int) -> np.ndarray:
    """Conservative triangle stamping: cells whose AABB overlaps a
    triangle AABB (supersampled by triangle subdivision for accuracy).
    tris in [0,1]^3. Returns (res, res, res) bool."""
    occ = np.zeros((res, res, res), bool)
    # subdivide triangles until edge < cell size, then stamp vertices
    cell = 1.0 / res
    stack = [tris]
    while stack:
        batch = stack.pop()
        if len(batch) == 0:
            continue
        e = np.linalg.norm(
            batch - np.roll(batch, 1, axis=1), axis=-1).max(axis=1)
        big = e > cell * 0.7
        small = batch[~big]
        if len(small):
            pts = small.reshape(-1, 3)
            idx = np.clip((pts * res).astype(int), 0, res - 1)
            occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True
            # also stamp centroids
            c = small.mean(axis=1)
            ci = np.clip((c * res).astype(int), 0, res - 1)
            occ[ci[:, 0], ci[:, 1], ci[:, 2]] = True
        b = batch[big]
        if len(b):
            m01 = (b[:, 0] + b[:, 1]) / 2
            m12 = (b[:, 1] + b[:, 2]) / 2
            m20 = (b[:, 2] + b[:, 0]) / 2
            stack.append(np.stack([b[:, 0], m01, m20], axis=1))
            stack.append(np.stack([b[:, 1], m12, m01], axis=1))
            stack.append(np.stack([b[:, 2], m20, m12], axis=1))
            stack.append(np.stack([m01, m12, m20], axis=1))
    return occ


class TakikawaEncoding:
    """Built from a triangle mesh normalized into [0,1]^3."""

    def __init__(self, triangles: np.ndarray, start_level: int = 2,
                 n_levels: int = 4, n_features_per_level: int = 4):
        self.F = n_features_per_level
        self.levels = [2 ** (start_level + l) for l in range(n_levels)]
        self.n_levels = n_levels
        self.index_volumes = []
        sizes = []
        for res in self.levels:
            occ = _voxelize_surface(np.asarray(triangles, np.float32), res)
            # corners of occupied cells
            corner = np.zeros((res + 1,) * 3, bool)
            xs, ys, zs = np.nonzero(occ)
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        corner[xs + dx, ys + dy, zs + dz] = True
            idx_vol = np.full((res + 1,) * 3, -1, np.int32)
            n = int(corner.sum())
            idx_vol[corner] = np.arange(n, dtype=np.int32)
            self.index_volumes.append(jnp.asarray(idx_vol))
            sizes.append(n)
        self.level_sizes = tuple(sizes)
        self.level_offsets = tuple(np.cumsum([0] + sizes[:-1]).tolist())
        self.n_params = int(sum(sizes))
        self.n_output_dims = self.F  # summed across levels (NGLOD style)

    def init(self, key, scale: float = 1e-3) -> jnp.ndarray:
        return jax.random.uniform(key, (max(self.n_params, 1), self.F),
                                  jnp.float32, -scale, scale)

    def __call__(self, table: jnp.ndarray, x: jnp.ndarray,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
        """x (N, 3) in [0,1]^3 -> (N, F): sum of per-level trilinear
        interpolations; levels whose cell is outside the octree are 0."""
        out = jnp.zeros((x.shape[0], self.F), jnp.float32)
        for l, res in enumerate(self.levels):
            vol = self.index_volumes[l]
            p = jnp.clip(x, 0.0, 1.0 - 1e-6) * res
            i0 = jnp.floor(p).astype(jnp.int32)
            f = p - i0
            acc = jnp.zeros((x.shape[0], self.F), jnp.float32)
            valid_all = jnp.ones(x.shape[0], bool)
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        c = i0 + jnp.asarray([dx, dy, dz])
                        slot = vol[c[:, 0], c[:, 1], c[:, 2]]
                        valid_all = valid_all & (slot >= 0)
                        w = ((f[:, 0] if dx else 1 - f[:, 0])
                             * (f[:, 1] if dy else 1 - f[:, 1])
                             * (f[:, 2] if dz else 1 - f[:, 2]))
                        feats = table[jnp.maximum(slot, 0) + self.level_offsets[l]]
                        acc = acc + w[:, None] * feats
            out = out + jnp.where(valid_all[:, None], acc, 0.0)
        return out.astype(compute_dtype)
