"""The composite NeRF model: HashGrid -> density MLP -> [feat ‖ SH(dir)] -> RGB MLP.

Capability match for `NerfNetwork<T>` (reference
include/neural-graphics-primitives/nerf_network.h:81-371):
- `density(params, x)`: position-only subpath (used by the occupancy-grid
  updater), returns the raw 16-dim density-MLP output; channel 0 is the
  raw (pre-activation) density.
- `forward(params, x, dir)`: full path; returns raw rgb (3) and raw
  density (1) — activations (sigmoid rgb / exp density) are applied by the
  compositing code, mirroring the reference's split
  (`network_to_rgb`/`network_to_density` live in the march kernels).
- Parameter packing order in snapshots matches nerf_network.h:356-371:
  density net -> rgb net -> pos encoding -> (dir encoding has no params).

No custom backward is needed: JAX autodiff through the gather/matmul chain
produces exactly the fused scatter-add backward the reference hand-writes.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .hash_encoding import HashEncoding, exact_encode, stochastic_encode
from .mlp import MLP
from .sh_encoding import sh_encode
from ..core.config import NGPNetworkConfig


class NerfParams(NamedTuple):
    hash_table: jnp.ndarray        # (n_params, F) fp32
    density_mlp: list              # list of weight matrices
    rgb_mlp: list
    envmap: Any = None             # (H, W, 4) trainable environment map
    distortion: Any = None         # (res, res, 2) trainable lens offsets
    latents: Any = None            # (N_img, n_extra_dims) per-image codes


class NerfNetwork:
    def __init__(self, config: NGPNetworkConfig | None = None, aabb_scale: int = 1,
                 n_extra_dims: int = 0, use_pallas_mlp: bool = False,
                 paired_fwd: bool = True, hash_grad: str = "stochastic",
                 hash_mode: str = "additive_x", mlp_fp32: bool = False):
        config = config or NGPNetworkConfig()
        self.config = config
        # mlp_fp32: run the MLP chain in fp32 instead of bf16 — a
        # quality-suspect A/B lever (VERDICT r3 Weak #4: bf16 keeps 8
        # mantissa bits where the reference's fp16 keeps 10; measure
        # whether that costs PSNR before blaming anything else)
        self.mlp_dtype = jnp.float32 if mlp_fp32 else jnp.bfloat16
        # hash-table backward on the training path: "stochastic" =
        # unbiased single-corner scatter (8x fewer updates);
        # "exact" = all-corner weighted scatter (the reference's
        # tiny-cuda-nn GridEncoding backward semantics). A/B'd at the
        # PSNR level — see docs/exp_hash_backward.
        assert hash_grad in ("stochastic", "exact"), hash_grad
        self.hash_grad = hash_grad
        # route MLPs through the Pallas fused chain (weights+activations
        # VMEM-resident, FullyFusedMLP-style) instead of the XLA matmul
        # chain; custom VJP makes it train-capable
        self.use_pallas_mlp = use_pallas_mlp
        enc = config.encoding
        self.pos_encoding = HashEncoding(
            n_levels=enc.n_levels,
            n_features_per_level=enc.n_features_per_level,
            log2_hashmap_size=enc.log2_hashmap_size,
            base_resolution=enc.base_resolution,
            per_level_scale=enc.resolve_per_level_scale(aabb_scale),
            n_dims=3,
            paired_fwd=paired_fwd,
            hash_mode=hash_mode,
        )
        self.sh_degree = config.dir_encoding.degree
        self.n_extra_dims = n_extra_dims
        self.n_density_outputs = config.n_density_outputs
        self.density_mlp = MLP(
            n_input=self.pos_encoding.n_output_dims,
            n_output=config.n_density_outputs,
            n_neurons=config.network.n_neurons,
            n_hidden_layers=config.network.n_hidden_layers,
            activation=config.network.activation,
        )
        self.rgb_mlp = MLP(
            n_input=config.n_density_outputs + self.sh_degree**2 + n_extra_dims,
            n_output=3,
            n_neurons=config.rgb_network.n_neurons,
            n_hidden_layers=config.rgb_network.n_hidden_layers,
            activation=config.rgb_network.activation,
        )

    def init(self, key: jax.Array) -> NerfParams:
        k1, k2, k3 = jax.random.split(key, 3)
        return NerfParams(
            hash_table=self.pos_encoding.init(k1),
            density_mlp=self.density_mlp.init(k2),
            rgb_mlp=self.rgb_mlp.init(k3),
        )

    def density(self, params: NerfParams, x: jnp.ndarray,
                level_mask: jnp.ndarray | None = None,
                grad_u: jnp.ndarray | None = None,
                paired: bool = False,
                paired_table: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (N, 3) in [0,1]^3 (warped). Returns raw density-MLP output (N, 16).

        grad_u: optional (n_levels, N) uniforms switching the hash-table
        backward to the fast stochastic-corner scatter (training path).
        paired: use the aligned-pair hash gather (half the HBM
        transactions) — for no-grad paths only (its autodiff would
        scatter into the double-width table and drop d/dx).
        paired_table: precomputed `make_paired_table(params.hash_table)`.
        Callers that evaluate many chunks per parameter state (renderer,
        grid update) MUST prebuild it once — rebuilding per chunk costs
        ~33 ms each on chip."""
        if grad_u is not None:
            encode = (stochastic_encode if self.hash_grad == "stochastic"
                      else exact_encode)
            feats = encode(
                self.pos_encoding, params.hash_table, x, grad_u
            ).astype(self.mlp_dtype)
        elif paired or paired_table is not None:
            enc = self.pos_encoding
            pt = (paired_table if paired_table is not None
                  else enc.make_paired_table(params.hash_table))
            feats = enc.paired_encode(pt, x, level_mask, self.mlp_dtype)
        else:
            feats = self.pos_encoding(params.hash_table, x, level_mask,
                                      self.mlp_dtype)
        return self._apply_mlp(self.density_mlp, params.density_mlp, feats)

    def _apply_mlp(self, mlp, mlp_params, x):
        if self.use_pallas_mlp:
            from .pallas_mlp import fused_mlp_apply

            return fused_mlp_apply(mlp, mlp_params, x)
        return mlp(mlp_params, x, compute_dtype=self.mlp_dtype)

    def forward(
        self,
        params: NerfParams,
        x: jnp.ndarray,
        dir_warped: jnp.ndarray,
        extra: jnp.ndarray | None = None,
        level_mask: jnp.ndarray | None = None,
        grad_u: jnp.ndarray | None = None,
        paired: bool = False,
        paired_table: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Full forward. Returns (N, 4): raw rgb (3) + raw density (1).

        Mirrors `inference_mixed_precision`'s output layout, which appends
        the raw density as channel 4 (nerf_network.h:105-139).
        """
        h = self.density(params, x, level_mask, grad_u, paired, paired_table)
        sh = sh_encode(dir_warped, self.sh_degree).astype(h.dtype)
        parts = [h, sh]
        if self.n_extra_dims > 0:
            assert extra is not None
            parts.append(extra.astype(h.dtype))
        rgb_in = jnp.concatenate(parts, axis=-1)
        rgb = self._apply_mlp(self.rgb_mlp, params.rgb_mlp, rgb_in)
        return jnp.concatenate([rgb, h[..., :1]], axis=-1)

    @property
    def n_params(self) -> int:
        return (
            self.pos_encoding.n_params * self.pos_encoding.F
            + self.density_mlp.n_params
            + self.rgb_mlp.n_params
        )


def rgb_activation(raw: jnp.ndarray) -> jnp.ndarray:
    """Logistic rgb activation (ENerfActivation::Logistic)."""
    return jax.nn.sigmoid(raw.astype(jnp.float32))


def density_activation(raw: jnp.ndarray) -> jnp.ndarray:
    """Exponential density activation, clamped like the reference
    (nerf_device.cuh:204-255 clamps the exponent to avoid inf)."""
    return jnp.exp(jnp.clip(raw.astype(jnp.float32), -15.0, 15.0))
