"""Alternative input encodings + factory.

The reference consumes tiny-cuda-nn's encoding zoo via `create_encoding`
(src/testbed.cu:3753): HashGrid (nn/hash_encoding.py), Frequency (NeRF
positional encoding), OneBlob, Identity — selected by the config JSONs
(configs/*/frequency.json, oneblob.json, ...). This module provides the
param-free encodings and a factory with a uniform interface:
`enc.init(key) -> params`, `enc(params, x) -> (N, n_output_dims)`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .hash_encoding import HashEncoding


class FrequencyEncoding:
    """[x, sin(2^k pi x), cos(2^k pi x)] per dim (NeRF positional enc.)."""

    def __init__(self, n_dims: int = 3, n_frequencies: int = 12):
        self.n_dims = n_dims
        self.n_frequencies = n_frequencies
        self.n_output_dims = n_dims * 2 * n_frequencies
        self.n_params = 0

    def init(self, key):
        return jnp.zeros((0,), jnp.float32)

    def __call__(self, params, x, level_mask=None, compute_dtype=jnp.float32):
        freqs = 2.0 ** jnp.arange(self.n_frequencies) * jnp.pi
        ang = x[..., None] * freqs                    # (N, D, F)
        out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return out.reshape(x.shape[0], -1).astype(compute_dtype)


class OneBlobEncoding:
    """Per-dim Gaussian kernel histogram over n_bins (tcnn OneBlob)."""

    def __init__(self, n_dims: int = 3, n_bins: int = 16):
        self.n_dims = n_dims
        self.n_bins = n_bins
        self.n_output_dims = n_dims * n_bins
        self.n_params = 0

    def init(self, key):
        return jnp.zeros((0,), jnp.float32)

    def __call__(self, params, x, level_mask=None, compute_dtype=jnp.float32):
        centers = (jnp.arange(self.n_bins) + 0.5) / self.n_bins
        sigma = 1.0 / self.n_bins
        d = x[..., None] - centers                    # (N, D, B)
        out = jnp.exp(-0.5 * (d / sigma) ** 2)
        return out.reshape(x.shape[0], -1).astype(compute_dtype)


class IdentityEncoding:
    def __init__(self, n_dims: int = 3):
        self.n_dims = n_dims
        self.n_output_dims = n_dims
        self.n_params = 0

    def init(self, key):
        return jnp.zeros((0,), jnp.float32)

    def __call__(self, params, x, level_mask=None, compute_dtype=jnp.float32):
        return x.astype(compute_dtype)


def create_encoding(cfg: dict, n_dims: int = 3, aabb_scale: int = 1,
                    desired_resolution: float = 2048.0):
    """`create_encoding` parity: build from a config-JSON encoding block."""
    otype = cfg.get("otype", "HashGrid").lower()
    if otype in ("hashgrid", "densegrid", "grid", "tiledgrid"):
        import math

        n_levels = cfg.get("n_levels", 8)
        base = cfg.get("base_resolution", 16)
        pls = cfg.get("per_level_scale")
        if pls is None:
            pls = (math.exp(math.log(desired_resolution * aabb_scale / base)
                            / max(n_levels - 1, 1)) if n_levels > 1 else 1.0)
        return HashEncoding(
            n_levels=n_levels,
            n_features_per_level=cfg.get("n_features_per_level", 4),
            log2_hashmap_size=cfg.get("log2_hashmap_size", 19),
            base_resolution=base,
            per_level_scale=pls,
            n_dims=n_dims,
        )
    if otype == "frequency":
        return FrequencyEncoding(n_dims, cfg.get("n_frequencies", 12))
    if otype == "oneblob":
        return OneBlobEncoding(n_dims, cfg.get("n_bins", 16))
    if otype == "identity":
        return IdentityEncoding(n_dims)
    raise ValueError(f"unsupported encoding otype {cfg.get('otype')}")
