"""Headless display-compositor math: FXAA + foveation unwarp.

The reference composites its hybrid frame through a fragment shader that
applies FXAA to the synthetic layer and a piecewise-quadratic foveation
unwarp to the sample coordinates
(/root/reference/scripts/virtual_desc/main.frag:24-95,100-120;
Foveation warp struct: common_device.cuh:228). This module is the same
math as pure JAX image ops — the last piece of the display path that is
meaningful without a window.

The FXAA variant is the published "optimized for mobile" FXAA kernel
(3x3 luma cross -> blur direction -> 2-tap / 4-tap blend, constants
REDUCE_MIN 1/128, REDUCE_MUL 1/8, SPAN_MAX 8), reimplemented over a
(H, W, 3) array with bilinear sub-pixel taps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_LUMA = jnp.asarray([0.299, 0.587, 0.114])
FXAA_REDUCE_MIN = 1.0 / 128.0
FXAA_REDUCE_MUL = 1.0 / 8.0
FXAA_SPAN_MAX = 8.0


def _bilinear(img: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray):
    """Sample (H, W, C) at fractional pixel coords (edge-clamped)."""
    H, W = img.shape[:2]
    py = jnp.clip(py, 0.0, H - 1.0)
    px = jnp.clip(px, 0.0, W - 1.0)
    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (py - y0)[..., None]
    fx = (px - x0)[..., None]
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def fxaa(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) -> (H, W, 3), the main.frag fxaa() kernel."""
    H, W = img.shape[:2]

    def shift(dy, dx):
        return jnp.roll(img, (-dy, -dx), axis=(0, 1))

    # NW/NE/SW/SE in texture space (+1 y offset = one row down in array
    # space after the frag's y-flip; diagonal neighbors either way)
    rgb_nw = shift(-1, -1)
    rgb_ne = shift(-1, 1)
    rgb_sw = shift(1, -1)
    rgb_se = shift(1, 1)
    l_nw = rgb_nw @ _LUMA
    l_ne = rgb_ne @ _LUMA
    l_sw = rgb_sw @ _LUMA
    l_se = rgb_se @ _LUMA
    l_m = img @ _LUMA
    l_min = jnp.minimum(l_m, jnp.minimum(jnp.minimum(l_nw, l_ne),
                                         jnp.minimum(l_sw, l_se)))
    l_max = jnp.maximum(l_m, jnp.maximum(jnp.maximum(l_nw, l_ne),
                                         jnp.maximum(l_sw, l_se)))

    dir_x = -((l_nw + l_ne) - (l_sw + l_se))
    dir_y = (l_nw + l_sw) - (l_ne + l_se)
    dir_reduce = jnp.maximum(
        (l_nw + l_ne + l_sw + l_se) * (0.25 * FXAA_REDUCE_MUL),
        FXAA_REDUCE_MIN)
    rcp = 1.0 / (jnp.minimum(jnp.abs(dir_x), jnp.abs(dir_y)) + dir_reduce)
    dir_x = jnp.clip(dir_x * rcp, -FXAA_SPAN_MAX, FXAA_SPAN_MAX)
    dir_y = jnp.clip(dir_y * rcp, -FXAA_SPAN_MAX, FXAA_SPAN_MAX)

    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def tap(k):
        return _bilinear(img, yy + dir_y * k, xx + dir_x * k)

    rgb_a = 0.5 * (tap(1.0 / 3.0 - 0.5) + tap(2.0 / 3.0 - 0.5))
    rgb_b = rgb_a * 0.5 + 0.25 * (tap(-0.5) + tap(0.5))
    l_b = rgb_b @ _LUMA
    outside = (l_b < l_min) | (l_b > l_max)
    return jnp.where(outside[..., None], rgb_a, rgb_b)


class FoveationWarp(NamedTuple):
    """Piecewise linear-quadratic resolution warp along one axis
    (common_device.cuh:228): quadratic density falloff left/right of a
    full-resolution center band."""
    al: float
    bl: float
    cl: float
    am: float
    bm: float
    ar: float
    br: float
    cr: float
    switch_left: float
    switch_right: float
    inv_switch_left: float
    inv_switch_right: float

    @staticmethod
    def identity() -> "FoveationWarp":
        return FoveationWarp(0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0,
                             0.0, 1.0, 0.0, 1.0)

    def warp(self, x):
        x = jnp.clip(x, 0.0, 1.0)
        left = self.al * x * x + self.bl * x + self.cl
        mid = self.am * x + self.bm
        right = self.ar * x * x + self.br * x + self.cr
        return jnp.where(x < self.switch_left, left,
                         jnp.where(x > self.switch_right, right, mid))

    def unwarp(self, y):
        """main.frag:24-34 — invert the piecewise warp."""
        y = jnp.clip(y, 0.0, 1.0)
        al = self.al if self.al != 0.0 else 1e-12
        ar = self.ar if self.ar != 0.0 else 1e-12
        left = (jnp.sqrt(jnp.maximum(
            -4.0 * al * self.cl + 4.0 * al * y + self.bl**2, 0.0))
            - self.bl) / (2.0 * al)
        right = (jnp.sqrt(jnp.maximum(
            -4.0 * ar * self.cr + 4.0 * ar * y + self.br**2, 0.0))
            - self.br) / (2.0 * ar)
        mid = (y - self.bm) / self.am
        return jnp.where(y < self.inv_switch_left, left,
                         jnp.where(y > self.inv_switch_right, right, mid))
