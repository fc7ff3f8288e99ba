"""Per-image sharpness maps (Laplacian magnitude).

Capability match for the reference's dataset sharpness grid
(nerf_loader.h sharpness_data: a low-res per-image sharpness measure used
to bias sampling toward in-focus regions). Computed lazily from the
loaded images; `sharpness_weighted` returns normalized weights suitable
for scaling per-ray loss deposits.
"""
from __future__ import annotations

import numpy as np


def sharpness_maps(images: np.ndarray, grid: int = 16) -> np.ndarray:
    """images: (N, H, W, C>=3) uint8/float -> (N, grid, grid) float32
    mean |Laplacian| of luminance per cell."""
    imgs = np.asarray(images, np.float32)
    if imgs.max() > 1.5:
        imgs = imgs / 255.0
    lum = (0.2126 * imgs[..., 0] + 0.7152 * imgs[..., 1]
           + 0.0722 * imgs[..., 2])
    lap = np.abs(
        4 * lum
        - np.roll(lum, 1, axis=1) - np.roll(lum, -1, axis=1)
        - np.roll(lum, 1, axis=2) - np.roll(lum, -1, axis=2)
    )
    n, h, w = lap.shape
    hh, ww = h // grid * grid, w // grid * grid
    cells = lap[:, :hh, :ww].reshape(n, grid, hh // grid, grid, ww // grid)
    return cells.mean(axis=(2, 4)).astype(np.float32)


def sharpness_weights(maps: np.ndarray, floor: float = 0.1) -> np.ndarray:
    """Normalize per image to mean 1 with a floor (so blurry regions still
    train, just down-weighted)."""
    m = maps / np.maximum(maps.mean(axis=(1, 2), keepdims=True), 1e-9)
    return np.maximum(m, floor).astype(np.float32)
