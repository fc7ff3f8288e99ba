"""Per-pixel losses with the reference's conventions.

Mirrors the loss zoo of nerf_device.cuh:75-143 (values only — gradients come
from JAX autodiff; a `jax.grad` of these functions reproduces the reference's
handwritten dloss/dprediction formulas, which our tests verify).
The reference divides Huber by 5 so its magnitude tracks L2 for PSNR
estimation (nerf_device.cuh:607-612).
"""
import jax
import jax.numpy as jnp

from ..core.constants import HUBER_ALPHA


def l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred - target
    return d * d


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def huber(pred: jnp.ndarray, target: jnp.ndarray, alpha: float = HUBER_ALPHA) -> jnp.ndarray:
    """Huber with the reference's 1/5 scaling trick."""
    d = jnp.abs(pred - target)
    quad = 0.5 * d * d / alpha
    lin = d - 0.5 * alpha
    return jnp.where(d < alpha, quad, lin) / 5.0


def relative_l2(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-2) -> jnp.ndarray:
    # RelativeL2: (p-t)^2 / (p^2 + eps) with a detached denominator.
    d = pred - target
    p = jax.lax.stop_gradient(pred)
    return d * d / (p * p + eps)


def smape(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-2) -> jnp.ndarray:
    p = jax.lax.stop_gradient(pred)
    return jnp.abs(pred - target) / (jnp.abs(p) + jnp.abs(target) + eps)


def mape(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-2) -> jnp.ndarray:
    """MAPE with detached denominator (tcnn Mape; configs/sdf/base.json)."""
    p = jax.lax.stop_gradient(pred)
    return jnp.abs(pred - target) / (jnp.abs(p) + eps)


def log_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(1.0 + jnp.abs(pred - target))


LOSSES = {
    "l2": l2,
    "l1": l1,
    "huber": huber,
    "relativel2": relative_l2,
    "smape": smape,
    "mape": mape,
    "logl1": log_l1,
}


def get_loss(name: str):
    return LOSSES[name.lower()]
