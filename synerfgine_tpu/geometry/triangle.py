"""Batched ray-triangle intersection (Möller–Trumbore) and normals.

Capability match for `Triangle::ray_intersect`/`normal`
(include/neural-graphics-primitives/triangle.cuh:26-120). The TPU-native
form is fully batched: (R rays) x (T triangles) dense tests on the VPU —
for the scene sizes the reference ships (<= ~1k faces per OBJ) this
outruns any divergent traversal; BVH (bvh.py) covers large meshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def triangle_normals(tris: jnp.ndarray) -> jnp.ndarray:
    """(T, 3, 3) -> unit normals (T, 3)."""
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = jnp.cross(e1, e2)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def ray_triangles_intersect(
    o: jnp.ndarray,          # (R, 3)
    d: jnp.ndarray,          # (R, 3)
    tris: jnp.ndarray,       # (T, 3, 3)
    t_max: float | jnp.ndarray = jnp.inf,
):
    """Closest-hit over all triangles. Returns (t (R,), tri_idx (R,) int32
    [-1 = miss], u (R,), v (R,)). Distances in units of |d|."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]  # (T, 3)
    e2 = tris[:, 2] - tris[:, 0]

    # broadcast (R, 1, 3) x (1, T, 3)
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])           # (R, T, 3)
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)             # (R, T)
    inv_det = jnp.where(jnp.abs(det) < _EPS, 0.0, 1.0 / det)
    tvec = o[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(qvec * d[:, None, :], axis=-1) * inv_det
    t = jnp.sum(qvec * e2[None, :, :], axis=-1) * inv_det

    hit = (
        (jnp.abs(det) >= _EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > _EPS) & (t < t_max)
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=-1)
    best_t = jnp.take_along_axis(t_masked, idx[:, None], axis=-1)[:, 0]
    best_u = jnp.take_along_axis(u, idx[:, None], axis=-1)[:, 0]
    best_v = jnp.take_along_axis(v, idx[:, None], axis=-1)[:, 0]
    missed = ~jnp.isfinite(best_t)
    return (
        jnp.where(missed, jnp.inf, best_t),
        jnp.where(missed, -1, idx).astype(jnp.int32),
        best_u,
        best_v,
    )


def ray_triangles_any_hit(
    o: jnp.ndarray, d: jnp.ndarray, tris: jnp.ndarray,
    t_min: float = 0.0, t_max: float | jnp.ndarray = jnp.inf,
) -> jnp.ndarray:
    """Occlusion query (shadow rays): True if ANY triangle is hit in
    (t_min, t_max). Cheaper reduction than closest-hit."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)
    inv_det = jnp.where(jnp.abs(det) < _EPS, 0.0, 1.0 / det)
    tvec = o[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(qvec * d[:, None, :], axis=-1) * inv_det
    t = jnp.sum(qvec * e2[None, :, :], axis=-1) * inv_det
    hit = (
        (jnp.abs(det) >= _EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return jnp.any(hit, axis=-1)
