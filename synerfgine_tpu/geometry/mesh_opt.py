"""Mesh refinement against the density field.

Capability match for `optimise_mesh_step` (N19, marching_cubes.cu): after
isosurface extraction, vertices are optimized so the field value at each
vertex matches the threshold, with umbrella-Laplacian regularization
keeping the surface smooth. The reference runs a handwritten vertex
kernel; here it is Adam over the vertex array with autodiff through the
(differentiable) density query.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _adjacency(faces: np.ndarray, n_verts: int):
    """Neighbor-sum operator: returns (edge_src, edge_dst, degree)."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.concatenate([e, e[:, ::-1]])
    e = np.unique(e, axis=0)
    deg = np.bincount(e[:, 0], minlength=n_verts).astype(np.float32)
    return (jnp.asarray(e[:, 0]), jnp.asarray(e[:, 1]),
            jnp.asarray(np.maximum(deg, 1.0)))


def optimize_mesh(
    density_fn,                 # (N, 3) in [0,1] -> field value (N,)
    verts: np.ndarray,
    faces: np.ndarray,
    threshold: float,
    n_steps: int = 50,
    lr: float = 1e-3,
    smooth_lambda: float = 0.1,
) -> np.ndarray:
    """Returns refined vertices (V, 3)."""
    v0 = jnp.asarray(verts, jnp.float32)
    src, dst, deg = _adjacency(np.asarray(faces), len(verts))

    def loss_fn(v):
        field = density_fn(jnp.clip(v, 0.0, 1.0))
        l_field = jnp.mean((field - threshold) ** 2)
        nb_sum = jnp.zeros_like(v).at[src].add(v[dst])
        umbrella = nb_sum / deg[:, None] - v
        l_smooth = jnp.mean(jnp.sum(umbrella**2, -1))
        return l_field + smooth_lambda * l_smooth

    @jax.jit
    def step(v, m, n, i):
        g = jax.grad(loss_fn)(v)
        m = 0.9 * m + 0.1 * g
        n = 0.99 * n + 0.01 * g * g
        t = i.astype(jnp.float32) + 1.0
        debias = jnp.sqrt(1 - 0.99**t) / (1 - 0.9**t)
        return v - lr * debias * m / (jnp.sqrt(n) + 1e-8), m, n

    v, m, n = v0, jnp.zeros_like(v0), jnp.zeros_like(v0)
    for i in range(n_steps):
        v, m, n = step(v, m, n, jnp.asarray(i))
    return np.asarray(v)
