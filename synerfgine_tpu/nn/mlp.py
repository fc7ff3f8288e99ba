"""Bias-free MLPs with bf16 compute / fp32 master params.

Capability match for tiny-cuda-nn's `FullyFusedMLP` (the reference's
"network"/"rgb_network" otype, configs/nerf/base.json): fixed-width
bias-free layers, ReLU hidden activation, raw (linear) outputs. On TPU
the right implementation is NOT a hand-fused kernel translation — XLA maps
the (N,64)x(64,64) matmul chain onto the MXU and fuses the ReLUs; weights
are cast to bf16 for the MXU with fp32 accumulation
(preferred_element_type), mirroring the reference's fp16 math + fp32-ish
accumulation behavior.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


_ACTS = {
    "relu": jax.nn.relu,
    "none": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
    "exponential": jnp.exp,
    "squareplus": lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0)),
    "softplus": jax.nn.softplus,
}


class MLP:
    """Static config; params are an explicit list of weight matrices."""

    def __init__(
        self,
        n_input: int,
        n_output: int,
        n_neurons: int = 64,
        n_hidden_layers: int = 1,
        activation: str = "relu",
        output_activation: str = "none",
    ):
        self.n_input = n_input
        self.n_output = n_output
        self.n_neurons = n_neurons
        self.n_hidden_layers = n_hidden_layers
        self.activation = _ACTS[activation]
        self.output_activation = _ACTS[output_activation]
        dims = [n_input] + [n_neurons] * n_hidden_layers + [n_output]
        self.dims = dims

    def init(self, key: jax.Array) -> list[jnp.ndarray]:
        """He-uniform init (statistical parity with tcnn's xavier-style)."""
        params = []
        for i in range(len(self.dims) - 1):
            key, sub = jax.random.split(key)
            fan_in, fan_out = self.dims[i], self.dims[i + 1]
            bound = np.sqrt(6.0 / (fan_in + fan_out))
            params.append(
                jax.random.uniform(sub, (fan_in, fan_out), jnp.float32, -bound, bound)
            )
        return params

    def __call__(
        self, params: Sequence[jnp.ndarray], x: jnp.ndarray, compute_dtype=jnp.bfloat16
    ) -> jnp.ndarray:
        h = x.astype(compute_dtype)
        n = len(params)
        for i, w in enumerate(params):
            h = jnp.dot(h, w.astype(compute_dtype), preferred_element_type=jnp.float32)
            if i < n - 1:
                h = self.activation(h).astype(compute_dtype)
        return self.output_activation(h)

    @property
    def n_params(self) -> int:
        return sum(self.dims[i] * self.dims[i + 1] for i in range(len(self.dims) - 1))
