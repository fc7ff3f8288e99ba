"""Fixed-step ray sampling (stage-2 marcher; no occupancy grid).

Uniform stratified samples between the ray's AABB entry/exit. The
occupancy-grid DDA marcher (march/dda.py) supersedes this for speed; this
remains the reference path for correctness tests and dense scenes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import BoundingBox, Ray


class RaySamples(NamedTuple):
    xs: jnp.ndarray      # (R, K, 3) positions, NGP space
    t: jnp.ndarray       # (R, K) distances along normalized dir
    dt: jnp.ndarray      # (R, K) step sizes
    valid: jnp.ndarray   # (R, K) bool


def sample_fixed_steps(
    rays: Ray,
    aabb: BoundingBox,
    n_steps: int,
    key: jax.Array | None = None,
    t_min_eps: float = 1e-4,
) -> RaySamples:
    """rays.d must be normalized. Jittered-stratified when key given."""
    o, d = rays.o, rays.d
    tmin, tmax = aabb.ray_intersect(o, d)
    tmin = jnp.maximum(tmin, t_min_eps)
    hit = tmax > tmin
    span = jnp.where(hit, tmax - tmin, 0.0)
    dt = span / n_steps
    i = jnp.arange(n_steps, dtype=jnp.float32)[None, :]
    if key is not None:
        jitter = jax.random.uniform(key, (o.shape[0], n_steps))
    else:
        jitter = 0.5
    t = tmin[:, None] + (i + jitter) * dt[:, None]
    xs = o[:, None, :] + d[:, None, :] * t[..., None]
    valid = hit[:, None] & jnp.broadcast_to(dt[:, None] > 0, t.shape)
    return RaySamples(xs=xs, t=t, dt=jnp.broadcast_to(dt[:, None], t.shape), valid=valid)
