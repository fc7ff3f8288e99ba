"""Multiresolution hash-grid encoding (instant-ngp), TPU-native.

Re-implements the capability of tiny-cuda-nn's `GridEncoding` (consumed by
the reference at src/testbed_nerf.cu:3611 via `create_encoding`): L levels of
feature grids with geometric resolution growth; dense indexing while a level
fits its parameter budget, spatial-hash indexing (XOR of per-dim primes)
beyond that; D-linear interpolation of 2^D corners.

TPU design notes
----------------
- One packed fp32 parameter table `(total_params, F)`; per-level offsets are
  static Python ints so XLA sees fixed slices.
- Forward is a static 8-way unrolled loop over levels of
  gather -> weighted-sum; XLA fuses the interpolation arithmetic into the
  gather consumer. Backward is the autodiff transpose: a deterministic
  XLA scatter-add into the table (there are no atomics on TPU; XLA's
  scatter-add is deterministic, unlike the reference's atomicAdd race).
- `level_mask` implements tcnn's `set_max_level` semantics (coarse-to-fine
  masking) as a multiplicative mask, which keeps shapes static.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# tcnn-compatible per-dimension hashing primes (prime[0]=1 keeps the x
# coordinate contiguous for cache coherence).
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037)


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class HashEncoding:
    """Static metadata + pure functions for one hash-grid encoding.

    This object holds only *static* (Python) configuration; parameters live
    in a pytree created by `init` and are passed explicitly to `__call__`.
    """

    def __init__(
        self,
        n_levels: int = 8,
        n_features_per_level: int = 4,
        log2_hashmap_size: int = 19,
        base_resolution: int = 16,
        per_level_scale: float = 2.0,
        n_dims: int = 3,
    ):
        self.n_levels = n_levels
        self.F = n_features_per_level
        self.n_dims = n_dims
        self.hashmap_size = 1 << log2_hashmap_size
        self.base_resolution = base_resolution
        self.per_level_scale = per_level_scale
        self.log2_per_level_scale = math.log2(per_level_scale)

        scales, resolutions, sizes, offsets, dense = [], [], [], [], []
        offset = 0
        for l in range(n_levels):
            scale = 2.0 ** (l * self.log2_per_level_scale) * base_resolution - 1.0
            res = int(math.ceil(scale)) + 1
            stride = res**n_dims
            is_dense = stride <= self.hashmap_size
            size = _next_multiple(stride, 8) if is_dense else self.hashmap_size
            scales.append(scale)
            resolutions.append(res)
            sizes.append(size)
            offsets.append(offset)
            dense.append(is_dense)
            offset += size
        self.scales = tuple(scales)
        self.resolutions = tuple(resolutions)
        self.level_sizes = tuple(sizes)
        self.level_offsets = tuple(offsets)
        self.level_is_dense = tuple(dense)
        self.n_params = offset
        self.n_output_dims = n_levels * self.F

        # All 2^D corner offsets, shape (2^D, D).
        corners = np.stack(
            np.meshgrid(*([np.array([0, 1])] * n_dims), indexing="ij"), axis=-1
        ).reshape(-1, n_dims)
        self._corners = corners.astype(np.int32)

    def init(self, key: jax.Array, scale: float = 1e-4) -> jnp.ndarray:
        """Hash table init ~ U(-1e-4, 1e-4), matching tcnn's default."""
        return jax.random.uniform(
            key, (self.n_params, self.F), jnp.float32, -scale, scale
        )

    def _level_indices(self, x: jnp.ndarray, level: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Return (corner_indices (N, 2^D) int32 into the packed table,
        weights (N, 2^D) fp32) for one level."""
        scale = self.scales[level]
        res = self.resolutions[level]
        pos = x * scale + 0.5
        idx0 = jnp.floor(pos)
        frac = pos - idx0
        idx0 = idx0.astype(jnp.int32)

        corners = jnp.asarray(self._corners)  # (C, D)
        coord = idx0[:, None, :] + corners[None, :, :]  # (N, C, D)
        coord = jnp.clip(coord, 0, res - 1)

        if self.level_is_dense[level]:
            stride = 1
            idx = jnp.zeros(coord.shape[:2], jnp.int32)
            for d in range(self.n_dims):
                idx = idx + coord[..., d] * stride
                stride *= res
        else:
            h = coord[..., 0].astype(jnp.uint32)  # prime[0] == 1
            for d in range(1, self.n_dims):
                h = h ^ (coord[..., d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d]))
            idx = (h % jnp.uint32(self.hashmap_size)).astype(jnp.int32)

        # D-linear interpolation weights: prod_d (corner_d ? frac : 1-frac)
        w = jnp.ones(coord.shape[:2], x.dtype)
        for d in range(self.n_dims):
            fd = frac[:, None, d]
            w = w * jnp.where(corners[None, :, d] == 1, fd, 1.0 - fd)
        return idx + self.level_offsets[level], w

    def __call__(
        self,
        table: jnp.ndarray,
        x: jnp.ndarray,
        level_mask: jnp.ndarray | None = None,
        compute_dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Encode positions x (N, D) in [0,1]^D -> features (N, L*F).

        level_mask: optional (L,) multiplicative mask (coarse-to-fine).
        """
        outs = []
        for l in range(self.n_levels):
            idx, w = self._level_indices(x, l)
            feats = table[idx]  # (N, C, F) gather
            out = jnp.sum(feats * w[..., None], axis=1)  # (N, F)
            if level_mask is not None:
                out = out * level_mask[l]
            outs.append(out)
        return jnp.concatenate(outs, axis=-1).astype(compute_dtype)
