"""Volume-rendering compositing — the TPU-native form of the reference's
`composite_kernel_nerf` / `compute_loss_kernel_train_nerf` walks
(testbed_nerf.cu:577-788, 1066-1272).

The reference walks each ray serially three times (fwd, compaction, grad).
On TPU the march is a dense (R, K) tensor program: transmittance is an
exclusive cumulative product along the sample axis, early termination is a
`T > eps` mask (samples past the cut contribute exactly zero, like the
reference's break), and the backward pass is JAX autodiff — which
reproduces the reference's handwritten suffix-sum gradient
(testbed_nerf.cu:1218-1272) mechanically.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import TRAIN_T_EPS


class CompositeResult(NamedTuple):
    rgb: jnp.ndarray          # (R, 3) accumulated color (no background)
    depth: jnp.ndarray        # (R,) expected termination distance
    opacity: jnp.ndarray      # (R,) 1 - T_final
    transmittance: jnp.ndarray  # (R,) T after the last sample
    weights: jnp.ndarray      # (R, K) per-sample contribution


def composite_rays(
    raw_rgb: jnp.ndarray,     # (R, K, 3) raw network rgb (pre-sigmoid)
    raw_sigma: jnp.ndarray,   # (R, K) raw network density (pre-exp)
    dt: jnp.ndarray,          # (R, K) step sizes
    t: jnp.ndarray,           # (R, K) sample distances (for depth)
    valid: jnp.ndarray | None = None,  # (R, K) bool sample validity
    min_transmittance: float = TRAIN_T_EPS,
) -> CompositeResult:
    sigma = jnp.exp(jnp.clip(raw_sigma.astype(jnp.float32), -15.0, 15.0))
    if valid is not None:
        sigma = jnp.where(valid, sigma, 0.0)
    alpha = 1.0 - jnp.exp(-sigma * dt)
    # T_i = prod_{j<i} (1 - alpha_j)  (exclusive)
    one_minus = 1.0 - alpha
    T = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[:, :1]), one_minus[:, :-1]], axis=1),
        axis=1,
    )
    # Early-termination: once T drops below eps the reference stops
    # compositing (testbed_nerf.cu:1058); zero further contributions.
    live = T > min_transmittance
    w = jnp.where(live, T * alpha, 0.0)
    rgb = jnp.sum(w[..., None] * jax.nn.sigmoid(raw_rgb.astype(jnp.float32)), axis=1)
    depth = jnp.sum(w * t, axis=1)
    T_final = jnp.prod(jnp.where(live, one_minus, 1.0), axis=1)
    opacity = jnp.sum(w, axis=1)
    return CompositeResult(rgb=rgb, depth=depth, opacity=opacity,
                           transmittance=T_final, weights=w)
