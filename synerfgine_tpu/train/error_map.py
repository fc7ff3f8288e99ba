"""Error-map importance sampling of training pixels.

Capability match for the reference's error-map machinery (N6 subpart:
CDF construction at testbed_nerf.cu:3376-3424, sampling at
nerf_device.cuh:499-599, UNIFORM_SAMPLING_FRACTION=0.5): each training
image keeps a low-res map of recent per-pixel loss; half of each ray
batch is drawn uniformly, half proportionally to the error CDF, so
training concentrates where the fit is worst.

Deviations (documented): the reference accumulates the map between
explicit CDF rebuilds on a growing cadence (128 steps x1.5); here the map
is an EMA and the CDFs are recomputed inside the jitted step — at the
32x32 map size the cumsums cost microseconds, which removes the rebuild
state machine entirely. The reference divides the *reported* loss by the
sampling pdf but keeps gradients unweighted (testbed_nerf.cu:1190-1196);
we keep gradients unweighted likewise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ERROR_MAP_RES = 32
UNIFORM_FRACTION = 0.5
ERROR_MAP_DECAY = 0.97


def init_error_map(n_images: int, res: int = ERROR_MAP_RES) -> jnp.ndarray:
    return jnp.ones((n_images, res, res), jnp.float32)


def deposit(error_map: jnp.ndarray, img_idx: jnp.ndarray, uv: jnp.ndarray,
            loss_per_ray: jnp.ndarray,
            decay: float = ERROR_MAP_DECAY,
            axis_name: str | None = None) -> jnp.ndarray:
    """EMA-decay the map and splat this batch's per-ray losses.

    axis_name: inside shard_map, every shard deposits its own rays and
    the deltas are psum'ed so the (replicated) map stays identical on all
    devices."""
    n, res = error_map.shape[0], error_map.shape[1]
    x = jnp.minimum((uv[:, 0] * res).astype(jnp.int32), res - 1)
    y = jnp.minimum((uv[:, 1] * res).astype(jnp.int32), res - 1)
    delta = jnp.zeros_like(error_map).at[img_idx, y, x].add(loss_per_ray)
    if axis_name is not None:
        delta = jax.lax.psum(delta, axis_name)
    return error_map * decay + delta


def sample_uv(key: jax.Array, error_map: jnp.ndarray,
              img_idx: jnp.ndarray) -> jnp.ndarray:
    """Mixed uniform / error-CDF pixel positions for each ray's image."""
    res = error_map.shape[1]
    k_mode, k_u, k_y, k_x, k_jit = jax.random.split(key, 5)
    R = img_idx.shape[0]

    m = error_map[img_idx] + 1e-8                    # (R, res, res)
    row_sum = jnp.sum(m, axis=2)                     # (R, res)
    cdf_y = jnp.cumsum(row_sum, axis=1)
    cdf_y = cdf_y / cdf_y[:, -1:]
    uy = jax.random.uniform(k_y, (R,))
    iy = jnp.sum(cdf_y < uy[:, None], axis=1).astype(jnp.int32)
    iy = jnp.minimum(iy, res - 1)

    row = jnp.take_along_axis(m, iy[:, None, None], axis=1)[:, 0]  # (R, res)
    cdf_x = jnp.cumsum(row, axis=1)
    cdf_x = cdf_x / cdf_x[:, -1:]
    ux = jax.random.uniform(k_x, (R,))
    ix = jnp.sum(cdf_x < ux[:, None], axis=1).astype(jnp.int32)
    ix = jnp.minimum(ix, res - 1)

    jitter = jax.random.uniform(k_jit, (R, 2))
    uv_imp = jnp.stack([(ix + jitter[:, 0]) / res,
                        (iy + jitter[:, 1]) / res], axis=-1)
    uv_uni = jax.random.uniform(k_u, (R, 2))
    use_uniform = jax.random.uniform(k_mode, (R,)) < UNIFORM_FRACTION
    return jnp.where(use_uniform[:, None], uv_uni, uv_imp)
