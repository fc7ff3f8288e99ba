"""Evaluation metrics: MSE / PSNR / SSIM (run.py protocol).

Mirrors scripts/common.py:49-189 semantics: PSNR from sRGB-clamped MSE;
SSIM with the standard Gaussian-window constants (data range 1.0).
"""
from __future__ import annotations

import numpy as np


def compose_on_background(rgba: np.ndarray, bg=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Straight-alpha composite of (H, W, 4) over a background color."""
    bg = np.asarray(bg, np.float32)
    return rgba[..., :3] * rgba[..., 3:4] + (1.0 - rgba[..., 3:4]) * bg


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    m = mse(np.clip(a, 0.0, max_val), np.clip(b, 0.0, max_val))
    if m == 0:
        return float("inf")
    return float(20 * np.log10(max_val) - 10 * np.log10(m))


def luminance(a: np.ndarray) -> np.ndarray:
    """Rec.709 luma of an (H, W, 3) image."""
    a = np.asarray(a, np.float64)
    return 0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2]


def _gaussian_kernel(size: int = 5, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Reference-protocol SSIM (scripts/common.py:189-204 behavior):
    computed on Rec.709 LUMINANCE with a 5-tap radius-2 Gaussian
    (sigma 1.5, renormalized), c1=0.01^2, c2=0.03^2 — numbers are
    directly comparable to reference-published runs. Grayscale inputs
    are used as-is."""
    from scipy.ndimage import convolve1d

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        a, b = luminance(a), luminance(b)
    k = _gaussian_kernel()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def blur(x):
        for axis in (0, 1):
            x = convolve1d(x, k, axis=axis)
        return x

    mu_a, mu_b = blur(a), blur(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = blur(a * a) - mu_aa
    s_bb = blur(b * b) - mu_bb
    s_ab = blur(a * b) - mu_ab
    p1 = (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    p2 = (2 * s_ab + c2) / (s_aa + s_bb + c2)
    return float(np.mean(p1 * p2))
