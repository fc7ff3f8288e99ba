"""The NGP optimizer stack: EMA ∘ ExponentialDecay ∘ Adam.

Capability match for the nested tcnn optimizer requested by
configs/nerf/base.json (consumed via `create_optimizer`,
src/testbed.cu:3843):
- Adam with debiased learning rate, eps=1e-15, and L2 regularization
  applied only to the MLP ("matrix") parameters — tcnn's Adam skips weight
  decay on non-matrix params (hash tables).
- ExponentialDecay of the learning rate: factor
  `base^(clamp(step-start, 0, end-start)/interval)` (continuous exponent).
- EMA of the parameters at decay 0.95 — training updates raw params, while
  inference/rendering uses the EMA'd copy (that is what tcnn's Ema wrapper
  does, and why NGP renders are stable mid-training).

Also hosts the small host-side Adam variants of adam_optimizer.h (camera
extrinsics etc.): `scalar_adam_step` and `rotation_adam_step` operating on
tiny pytrees — on TPU these are just the same jitted math.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import OptimizerConfig


class AdamState(NamedTuple):
    mu: Any      # first-moment pytree
    nu: Any      # second-moment pytree
    step: jnp.ndarray


class NGPOptState(NamedTuple):
    adam: AdamState
    ema_params: Any


def lr_at_step(cfg: OptimizerConfig, step: jnp.ndarray) -> jnp.ndarray:
    """Learning rate after exponential decay at `step`."""
    d = cfg.decay
    t = jnp.clip(step - d.decay_start, 0, max(d.decay_end - d.decay_start, 0))
    factor = jnp.power(d.decay_base, t.astype(jnp.float32) / d.decay_interval)
    return cfg.adam.learning_rate * factor


class NGPOptimizer:
    def __init__(self, cfg: OptimizerConfig | None = None, l2_mask_fn=None,
                 skip_zero_grad: bool = False):
        """l2_mask_fn(path_leaf) -> bool: whether L2 reg applies to a leaf.

        Default: apply L2 to everything except the hash table (leaf named
        'hash_table' in NerfParams) — matching tcnn matrix-params-only decay.

        skip_zero_grad: freeze hash-table entries whose gradient is
        exactly 0 this step (no moment update, no parameter step) — the
        instant-ngp paper's "we skip Adam steps for hash table entries
        whose gradient is exactly 0" (tcnn adam.h skip_zero_grad).
        Without it, momentum keeps moving untouched rows for ~40 steps
        after their last gradient — and the stochastic single-corner
        backward touches only ~9% of rows per step, so ~91% of the
        table is being smeared by stale momentum every step."""
        self.cfg = cfg or OptimizerConfig()
        self._l2_mask_fn = l2_mask_fn
        self.skip_zero_grad = skip_zero_grad

    def _l2_mask(self, params):
        if self._l2_mask_fn is not None:
            return self._l2_mask_fn(params)
        # NerfParams-aware default: no decay on the hash table.
        if hasattr(params, "_fields") and "hash_table" in params._fields:
            return type(params)(
                **{
                    k: jax.tree.map(lambda _: k != "hash_table", getattr(params, k))
                    for k in params._fields
                }
            )
        return jax.tree.map(lambda _: True, params)

    def init(self, params) -> NGPOptState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return NGPOptState(
            adam=AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                           step=jnp.zeros((), jnp.int32)),
            # distinct buffers: params & ema may both live in a donated state
            ema_params=jax.tree.map(lambda p: p + 0, params),
        )

    def update(self, grads, state: NGPOptState, params):
        cfg = self.cfg
        a = cfg.adam
        step = state.adam.step + 1
        lr = lr_at_step(cfg, step)

        l2_mask = self._l2_mask(params)
        grads = jax.tree.map(
            lambda g, p, m: g + a.l2_reg * p if m else g, grads, params, l2_mask
        )
        mu = jax.tree.map(lambda m, g: a.beta1 * m + (1 - a.beta1) * g,
                          state.adam.mu, grads)
        nu = jax.tree.map(lambda v, g: a.beta2 * v + (1 - a.beta2) * g * g,
                          state.adam.nu, grads)
        t = step.astype(jnp.float32)
        debias = jnp.sqrt(1 - a.beta2**t) / (1 - a.beta1**t)
        lr_t = lr * debias
        new_params = jax.tree.map(
            lambda p, m, v: p - lr_t * m / (jnp.sqrt(v) + a.epsilon),
            params, mu, nu,
        )
        if self.skip_zero_grad and hasattr(params, "_fields") \
                and "hash_table" in params._fields:
            # zero-grad hash rows keep params AND moments (frozen step)
            g0 = grads.hash_table
            upd = g0 != 0.0
            mu = mu._replace(hash_table=jnp.where(
                upd, mu.hash_table, state.adam.mu.hash_table))
            nu = nu._replace(hash_table=jnp.where(
                upd, nu.hash_table, state.adam.nu.hash_table))
            new_params = new_params._replace(hash_table=jnp.where(
                upd, new_params.hash_table, params.hash_table))
        ema_d = cfg.ema_decay
        # tcnn Ema debiases by (1 - decay^step) so early-training inference
        # is not biased toward the init.
        ema_raw = jax.tree.map(
            lambda e, p: ema_d * e + (1 - ema_d) * p, state.ema_params, new_params
        )
        new_state = NGPOptState(adam=AdamState(mu=mu, nu=nu, step=step),
                                ema_params=ema_raw)
        return new_params, new_state

    def inference_params(self, state: NGPOptState, params=None):
        """EMA parameters for rendering. The EMA is seeded with the init
        params, so no debias correction is needed (seeding avoids the
        cold-start bias a zero-seeded EMA would have)."""
        return state.ema_params


def scalar_adam_step(param, grad, mu, nu, step, lr, beta1=0.9, beta2=0.99,
                     eps=1e-8):
    """`AdamOptimizer<T>` of adam_optimizer.h:25-118 — used per-image for
    extrinsics translation, exposure, focal length."""
    mu = beta1 * mu + (1 - beta1) * grad
    nu = beta2 * nu + (1 - beta2) * grad * grad
    t = step.astype(jnp.float32)
    debias = jnp.sqrt(1 - beta2**t) / (1 - beta1**t)
    return param - lr * debias * mu / (jnp.sqrt(nu) + eps), mu, nu


def rotation_adam_step(rot_axisangle, grad, mu, nu, step, lr, beta1=0.9,
                       beta2=0.99, eps=1e-8):
    """`RotationAdamOptimizer` — Adam on the axis-angle manifold: the update
    is computed in the tangent space and composed with the current rotation."""
    from ..core import se3

    delta, mu, nu = scalar_adam_step(
        jnp.zeros_like(rot_axisangle), grad, mu, nu, step, lr, beta1, beta2, eps
    )
    new_rot = se3.compose_axis_angle(delta - 0.0, rot_axisangle)
    return new_rot, mu, nu
