"""Volume mode: neural volumetric density fields (smoke/cloud rendering).

Capability match for the reference's volume testbed
(src/testbed_volume.cu, N18 in SURVEY.md §2): fit a coordinate network
(hash encoding -> MLP -> rgba) to a ground-truth density volume (the
reference streams NanoVDB grids; here any dense numpy density array — the
capability is the neural-volume fit + renderer, not the VDB container),
render with absorption ray marching against a uniform sky/ground
environment, train from randomly sampled points of the payload.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam
from ..core.config import NGPNetworkConfig
from ..core.types import BoundingBox
from ..nn.hash_encoding import HashEncoding
from ..nn.mlp import MLP
from ..nn.optimizers import NGPOptimizer, NGPOptState


class VolumeModel:
    """x -> (raw_rgb[3], raw_sigma); sigma via softplus-free exp."""

    def __init__(self, config: NGPNetworkConfig | None = None):
        cfg = config or NGPNetworkConfig()
        enc = cfg.encoding
        self.encoding = HashEncoding(
            n_levels=enc.n_levels, n_features_per_level=enc.n_features_per_level,
            log2_hashmap_size=enc.log2_hashmap_size,
            base_resolution=enc.base_resolution,
            per_level_scale=enc.resolve_per_level_scale(1), n_dims=3,
        )
        self.mlp = MLP(self.encoding.n_output_dims, 4,
                       n_neurons=cfg.network.n_neurons,
                       n_hidden_layers=cfg.network.n_hidden_layers)
        self.config = cfg

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"hash_table": self.encoding.init(k1), "mlp": self.mlp.init(k2)}

    def __call__(self, params, x):
        feats = self.encoding(params["hash_table"], x, compute_dtype=jnp.bfloat16)
        out = self.mlp(params["mlp"], feats).astype(jnp.float32)
        rgb = jax.nn.sigmoid(out[:, :3])
        sigma = jnp.exp(jnp.clip(out[:, 3], -15.0, 15.0))
        return rgb, sigma


class VolumeTrainState(NamedTuple):
    params: dict
    opt_state: NGPOptState
    key: jax.Array


class VolumeTrainer:
    def __init__(self, model: VolumeModel, density: np.ndarray,
                 albedo=(0.95, 0.95, 0.95), batch_size: int = 1 << 14,
                 density_scale: float = 1.0):
        """density: (X, Y, Z) float; sampled trilinearly in [0,1]^3."""
        self.model = model
        self.density = jnp.asarray(density, jnp.float32) * density_scale
        self.albedo = jnp.asarray(albedo, jnp.float32)
        self.batch_size = batch_size
        self.opt = NGPOptimizer(
            model.config.optimizer,
            l2_mask_fn=lambda p: {"hash_table": False,
                                  "mlp": [True] * len(p["mlp"])})
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def sample_gt(self, x: jnp.ndarray) -> jnp.ndarray:
        """Trilinear lookup of the GT density at x in [0,1]^3."""
        g = self.density
        dims = jnp.asarray(g.shape, jnp.float32)
        pos = x * (dims - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        f = pos - i0
        i0 = jnp.clip(i0, 0, jnp.asarray(g.shape) - 2)
        acc = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = ((f[:, 0] if dx else 1 - f[:, 0])
                         * (f[:, 1] if dy else 1 - f[:, 1])
                         * (f[:, 2] if dz else 1 - f[:, 2]))
                    acc = acc + w * g[i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz]
        return acc

    def init(self, key):
        params = self.model.init(key)
        return VolumeTrainState(params, self.opt.init(params), key)

    def _train_step(self, state: VolumeTrainState):
        key, k = jax.random.split(state.key)
        x = jax.random.uniform(k, (self.batch_size, 3))
        sigma_gt = self.sample_gt(x)

        def loss_fn(p):
            rgb, sigma = self.model(p, x)
            # density supervision + albedo prior on the color head
            l_sigma = jnp.mean((jnp.log1p(sigma) - jnp.log1p(sigma_gt)) ** 2)
            l_rgb = jnp.mean((rgb - self.albedo) ** 2 * sigma_gt[:, None])
            return l_sigma + l_rgb

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        params, opt_state = self.opt.update(grads, state.opt_state, state.params)
        return VolumeTrainState(params, opt_state, key), loss

    def step(self, state):
        return self._step(state)

    def render(self, state: VolumeTrainState, camera, width=128, height=128,
               n_steps: int = 128, sky=(0.6, 0.7, 0.9), ground=(0.3, 0.28, 0.25)):
        """Absorption/emission march with sky/ground environment
        (render_volume behavior)."""
        params = self.opt.inference_params(state.opt_state)
        aabb = BoundingBox(jnp.zeros(3), jnp.ones(3))
        uv = np.stack(np.meshgrid(
            (np.arange(width) + 0.5) / width,
            (np.arange(height) + 0.5) / height), -1).reshape(-1, 2).astype(np.float32)
        rays = cam.uv_to_ray(jnp.asarray(uv), jnp.asarray(camera, jnp.float32),
                             (width, height), (width * 1.2, height * 1.2))
        d = rays.d / jnp.linalg.norm(rays.d, axis=-1, keepdims=True)

        @jax.jit
        def march(p, o, d):
            tmin, tmax = aabb.ray_intersect(o, d)
            tmin = jnp.maximum(tmin, 1e-4)
            hit = tmax > tmin
            dt = jnp.where(hit, (tmax - tmin) / n_steps, 0.0)
            rgb_acc = jnp.zeros((o.shape[0], 3))
            T = jnp.ones(o.shape[0])

            def body(i, carry):
                rgb_acc, T = carry
                t = tmin + (i + 0.5) * dt
                x = jnp.clip(o + d * t[:, None], 0.0, 1.0)
                rgb, sigma = self.model(p, x)
                alpha = 1 - jnp.exp(-sigma * dt)
                w = T * alpha
                return rgb_acc + w[:, None] * rgb, T * (1 - alpha)

            rgb_acc, T = jax.lax.fori_loop(0, n_steps, body, (rgb_acc, T))
            bg = jnp.where(d[:, 1:2] > 0, jnp.asarray(sky), jnp.asarray(ground))
            return rgb_acc + T[:, None] * bg, 1.0 - T

        rgb, alpha = march(params, rays.o, d)
        return {"rgb": np.asarray(rgb).reshape(height, width, 3),
                "alpha": np.asarray(alpha).reshape(height, width)}

    def field_mse(self, state: VolumeTrainState, n: int = 1 << 15) -> float:
        params = self.opt.inference_params(state.opt_state)
        x = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
        _, sigma = self.model(params, x)
        gt = self.sample_gt(x)
        return float(jnp.mean((jnp.log1p(sigma) - jnp.log1p(gt)) ** 2))
