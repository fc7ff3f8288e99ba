"""Mesh-on-NeRF shadows + NeRF G-buffer helpers.

Capability match for the fork's Testbed surgery (N9 in SURVEY.md §2):
- position G-buffer from NeRF termination depth (`extract_from_payload`,
  testbed_nerf.cu:1578-1612),
- screen-space normals from position differences
  (`write_normals_to_buffer`, testbed_nerf.cu:1523-1576),
- `shadow_for_px` (testbed_nerf.cu:1614-1700): per NeRF pixel, the shadow
  is min over lights of (mesh-occlusion depth ratio)^intensity and the
  NeRF self-occlusion mask, with directional lights contributing
  n·l-based dimming,
- `shade_with_shadow` (testbed_nerf.cu:1702-1786): the shadow is averaged
  over a kernel_size^2 neighborhood then applied multiplicatively.

TPU reformulation: the reference recomputes shadow_for_px for every
neighbor inside every pixel's kernel loop (k^2 redundant evaluations);
here the per-pixel shadow map is computed once and box-filtered — the
same result at 1/k^2 the shadow-ray cost.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Ray
from .raytracer import RayTracer


def positions_from_depth(o: jnp.ndarray, d: jnp.ndarray,
                         depth: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) origin/dir + (H, W) depth -> world positions."""
    return o + d * depth[..., None]


def normals_from_positions(pos: jnp.ndarray) -> jnp.ndarray:
    """Screen-space normals: cross of horizontal/vertical position
    differences (write_normals_to_buffer behavior)."""
    dx = jnp.diff(pos, axis=1, append=pos[:, -1:])
    dy = jnp.diff(pos, axis=0, append=pos[-1:])
    n = jnp.cross(dx, dy)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def shadow_map(
    tracer: RayTracer,
    positions: jnp.ndarray,      # (N, 3) NeRF surface points
    normals: jnp.ndarray,        # (N, 3)
    world: dict,
    bitfield: jnp.ndarray,
    key: jax.Array,
    nerf_shadow_intensity: float = 1.0,
    nerf_on_nerf_threshold: float = 0.2,
) -> jnp.ndarray:
    """Per-point shadow factor in [0, 1] (shadow_for_px)."""
    N = positions.shape[0]
    overall = jnp.ones(N)
    n_lights = world["light_pos"].shape[0]
    for l in range(n_lights):
        lpos0 = world["light_pos"][l]
        lsize = world["light_size"][l]
        lint = world["light_intensity"][l]
        is_point = world["light_type"][l] == 0
        key, k1 = jax.random.split(key)
        lpos = lpos0 + jax.random.uniform(k1, (N, 3)) * lsize
        Lvec = lpos - positions
        full_d = jnp.linalg.norm(Lvec, axis=-1)
        L = Lvec / jnp.maximum(full_d[:, None], 1e-12)

        # mesh occlusion (objects shadow the NeRF)
        syn_depth = tracer._occlusion_depth_world(positions, L, world)
        syn_mask = jnp.minimum(syn_depth / jnp.maximum(full_d, 1e-12), 1.0)
        syn_mask = jnp.power(syn_mask, nerf_shadow_intensity)

        # NeRF self-occlusion: start offset avoids the surface's own cell
        # (testbed_nerf.cu:1662 fract_offset semantics)
        offset = (full_d * nerf_on_nerf_threshold)[:, None] * L
        nerf_depth = tracer.nerf_occlusion_depth(
            positions + offset, L, bitfield, full_d)
        nerf_mask = nerf_depth * (1.0 - jnp.minimum(lint, 0.0)) / (
            jnp.maximum(full_d, 1e-12) * (1.0 - nerf_on_nerf_threshold))
        nerf_mask = jnp.clip(nerf_mask, 0.0, 1.0)

        point_shadow = jnp.minimum(overall, jnp.minimum(syn_mask, nerf_mask))
        dir_shadow = jnp.minimum(
            1.0,
            overall + jnp.minimum(0.0, jnp.sum(L * normals, -1)) * lint,
        )
        overall = jnp.where(is_point, point_shadow, dir_shadow)
    return overall


def box_filter(img: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """(H, W) mean filter with edge clamping (the reference's kernel
    averaging, capped at MAX_KERNEL_SQ_SIZE=900 i.e. k<=30)."""
    k = min(max(int(kernel_size), 1), 30)
    if k <= 1:
        return img
    kernel = jnp.ones((k, k, 1, 1))

    def conv(x):
        return jax.lax.conv_general_dilated(
            x[None, :, :, None], kernel, window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    # divide by the in-bounds neighbor count (the reference skips
    # out-of-bounds texels rather than zero-padding)
    return conv(img) / conv(jnp.ones_like(img))
