"""Tonemap curves: Identity / ACES / Hable / Reinhard.

Capability match for `sng_tonemap` (src/synerfgine/common.cu:186-243) and
the render-buffer tonemapper (common.h:113-119). Same rational-polynomial
constants (ACES approximation with pre-exposure cancellation; Hable with
W=11.2 white scale folded in).
"""
import jax.numpy as jnp


def _rational(x, k0, k1, k2, k3, k4, k5):
    x2 = x * x
    return (x2 * k0 + k1 * x + k2) / (k3 * x2 + k4 * x + k5)


def tonemap(x: jnp.ndarray, curve: str = "identity") -> jnp.ndarray:
    curve = curve.lower()
    if curve == "identity":
        return x
    x = jnp.maximum(x, 0.0)
    if curve == "aces":
        return _rational(
            x,
            0.6 * 0.6 * 2.51, 0.6 * 0.03, 0.0,
            0.6 * 0.6 * 2.43, 0.6 * 0.59, 0.14,
        )
    if curve == "hable":
        A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        k0 = A * F - A * E
        k1 = C * B * F - B * E
        k2 = 0.0
        k3 = A * F
        k4 = B * F
        k5 = D * F * F
        W = 11.2
        white_scale = (k3 * W * W + k4 * W + k5) / (k0 * W * W + k1 * W + k2)
        return _rational(
            x, 4 * k0 * white_scale, 2 * k1 * white_scale, k2 * white_scale,
            4 * k3, 2 * k4, k5,
        )
    if curve == "reinhard":
        lum = (0.2126 * x[..., 0] + 0.7152 * x[..., 1] + 0.0722 * x[..., 2])
        return x / (lum[..., None] + 1.0)
    raise ValueError(f"unknown tonemap curve {curve}")


TONEMAP_CURVES = ("identity", "aces", "hable", "reinhard")
