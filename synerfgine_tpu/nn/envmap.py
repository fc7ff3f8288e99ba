"""Trainable environment map + lens distortion grid.

Capability match for the reference's trainable buffers
(trainable_buffer.cuh; envmap block of configs/nerf/base.json; distortion
map 32x32): a lat-long HDR environment texture that receives gradients
through the ray background term, and a low-res uv-offset grid modelling
residual lens distortion, both optimized jointly with the network.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_envmap(height: int = 64, width: int = 128) -> jnp.ndarray:
    """(H, W, 4) rgb+alpha, zero-initialized (transparent black)."""
    return jnp.zeros((height, width, 4), jnp.float32)


def sample_envmap(env: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lat-long lookup. dirs: (N, 3) unit vectors -> (N, 4)."""
    h, w = env.shape[:2]
    theta = jnp.arccos(jnp.clip(dirs[:, 1], -1.0, 1.0))       # [0, pi]
    phi = jnp.arctan2(dirs[:, 2], dirs[:, 0])                  # [-pi, pi]
    u = (phi / (2.0 * jnp.pi) + 0.5) * w - 0.5
    v = theta / jnp.pi * h - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    u0 = u0.astype(jnp.int32) % w
    u1 = (u0 + 1) % w                          # wrap azimuth
    v0 = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)
    e00 = env[v0, u0]
    e01 = env[v0, u1]
    e10 = env[v1, u0]
    e11 = env[v1, u1]
    out = (e00 * (1 - fu) * (1 - fv) + e01 * fu * (1 - fv)
           + e10 * (1 - fu) * fv + e11 * fu * fv)
    # rgb stays raw/linear (clamping at zero-init would kill gradients);
    # alpha = sigmoid(raw - 3): ~0.05 at init (near-transparent) with
    # live gradients everywhere
    return jnp.concatenate(
        [out[:, :3], jax.nn.sigmoid(out[:, 3:] - 3.0)],
        axis=-1,
    )


def envmap_background(env: jnp.ndarray, dirs: jnp.ndarray,
                      base_bg: jnp.ndarray) -> jnp.ndarray:
    """Composite the envmap over the (random) base background, like the
    reference's `background_color = envmap.rgb + bg*(1-envmap.a)`
    (testbed_nerf.cu:1111-1117)."""
    e = sample_envmap(env, dirs)
    return e[:, :3] + base_bg * (1.0 - e[:, 3:])


def init_distortion(res: int = 32) -> jnp.ndarray:
    """(res, res, 2) uv-offset grid, zero-initialized."""
    return jnp.zeros((res, res, 2), jnp.float32)


def apply_distortion(grid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """uv (N, 2) in [0,1] -> distorted uv (bilinear offset lookup)."""
    res = grid.shape[0]
    p = uv * (res - 1)
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, res - 2)
    f = p - i0
    g00 = grid[i0[:, 1], i0[:, 0]]
    g01 = grid[i0[:, 1], i0[:, 0] + 1]
    g10 = grid[i0[:, 1] + 1, i0[:, 0]]
    g11 = grid[i0[:, 1] + 1, i0[:, 0] + 1]
    off = (g00 * (1 - f[:, :1]) * (1 - f[:, 1:])
           + g01 * f[:, :1] * (1 - f[:, 1:])
           + g10 * (1 - f[:, :1]) * f[:, 1:]
           + g11 * f[:, :1] * f[:, 1:])
    return uv + off
