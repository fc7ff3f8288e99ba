"""Core geometric pytree types.

Plain NamedTuples: they are automatically JAX pytrees, cheap to construct
inside jitted code, and layout-transparent (struct-of-arrays: every field is
an array batched over rays/samples).  The reference's AoS `Ray`/`BoundingBox`
structs (common.h:56-205) become SoA here — the natural TPU layout.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Ray(NamedTuple):
    """A bundle of rays: origins (..., 3) and directions (..., 3)."""

    o: jnp.ndarray
    d: jnp.ndarray

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.o + self.d * t[..., None]


# Alias used where the batched nature deserves emphasis.
RayBundle = Ray


class BoundingBox(NamedTuple):
    """Axis-aligned box; min/max are (3,) or broadcastable arrays.

    `ray_intersect` is the slab test (reference bounding_box.cuh behavior):
    returns (tmin, tmax); the ray hits iff tmin <= tmax and tmax >= 0.
    """

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def center(self) -> jnp.ndarray:
        return 0.5 * (self.lo + self.hi)

    @property
    def size(self) -> jnp.ndarray:
        return self.hi - self.lo

    def ray_intersect(self, o: jnp.ndarray, d: jnp.ndarray):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
        t0 = (self.lo - o) * inv_d
        t1 = (self.hi - o) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return tmin, tmax

    def contains(self, p: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((p >= self.lo) & (p <= self.hi), axis=-1)

    def relative_pos(self, p: jnp.ndarray) -> jnp.ndarray:
        return (p - self.lo) / self.size


def unit_aabb() -> BoundingBox:
    return BoundingBox(jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32))
