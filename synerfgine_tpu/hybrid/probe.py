"""Spherical NeRF light probe for reflections.

Capability match for `sng::LightProbe` (src/synerfgine/probe.cu:81-222,
S9 in SURVEY.md §2): renders the NeRF into an equirectangular map around
a probe center so glossy materials can sample environment radiance from
the reflected direction. Like the reference (wired to
`m_enable_reflections`, engine.cuh:115, but not part of the default frame
path) the probe is an optional component consumed by the ray tracer.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.types import Ray
from ..march.composite import composite_rays
from ..march.dda import compact_samples, march_rays_grid, scatter_back
from ..core.constants import RENDER_MIN_TRANSMITTANCE


class LightProbe:
    def __init__(self, height: int = 32, width: int = 64):
        self.height = height
        self.width = width
        self.map = jnp.zeros((height, width, 4), jnp.float32)  # rgb + alpha

    def directions(self) -> jnp.ndarray:
        """Equirect pixel-center directions, (H*W, 3)."""
        h, w = self.height, self.width
        v = (jnp.arange(h) + 0.5) / h
        u = (jnp.arange(w) + 0.5) / w
        uu, vv = jnp.meshgrid(u, v)
        theta = vv * jnp.pi          # polar from +y
        phi = (uu - 0.5) * 2 * jnp.pi
        d = jnp.stack([
            jnp.sin(theta) * jnp.cos(phi),
            jnp.cos(theta),
            jnp.sin(theta) * jnp.sin(phi),
        ], axis=-1)
        return d.reshape(-1, 3)

    def capture(self, network, params, grid, grid_state, aabb, center,
                n_steps: int = 256, cone_angle: float = 0.0):
        """Render the NeRF from `center` into the probe map."""
        d = self.directions()
        o = jnp.broadcast_to(jnp.asarray(center, jnp.float32), d.shape)
        samples = march_rays_grid(Ray(o, d), aabb, grid, grid_state.bitfield,
                                  n_steps, cone_angle)
        comp_in = compact_samples(samples, (d + 1.0) * 0.5, d.shape[0] * 32)
        xs_unit = jnp.clip(aabb.relative_pos(comp_in.xs), 0.0, 1.0)
        out = network.forward(params, xs_unit, comp_in.dirs, paired=True)
        dense = scatter_back(out, comp_in, d.shape[0], n_steps)
        comp = composite_rays(dense[..., :3], dense[..., 3], samples.dt,
                              samples.t, comp_in.valid,
                              RENDER_MIN_TRANSMITTANCE)
        rgba = jnp.concatenate([comp.rgb, comp.opacity[:, None]], axis=-1)
        self.map = rgba.reshape(self.height, self.width, 4)
        return self.map

    def sample(self, dirs: jnp.ndarray) -> jnp.ndarray:
        """Nearest lookup of probe radiance for (N, 3) unit directions."""
        h, w = self.height, self.width
        theta = jnp.arccos(jnp.clip(dirs[:, 1], -1.0, 1.0))
        phi = jnp.arctan2(dirs[:, 2], dirs[:, 0])
        v = jnp.clip((theta / jnp.pi * h).astype(jnp.int32), 0, h - 1)
        u = ((phi / (2 * jnp.pi) + 0.5) * w).astype(jnp.int32) % w
        return self.map[v, u]
