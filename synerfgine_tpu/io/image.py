"""Image IO + color space conversions.

Mirrors the reference's image handling (scripts/common.py:49-189 for the
srgb/linear conversions; stb/tinyexr for IO). PNG/JPG via PIL; EXR via our
decoder.
"""
from __future__ import annotations

import numpy as np

from .exr import read_exr


def srgb_to_linear(img: np.ndarray):
    xp = np
    try:
        import jax.numpy as jnp

        if isinstance(img, jnp.ndarray):
            xp = jnp
    except ImportError:
        pass
    limit = 0.04045
    return xp.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img):
    xp = np
    try:
        import jax.numpy as jnp

        if isinstance(img, jnp.ndarray):
            xp = jnp
    except ImportError:
        pass
    limit = 0.0031308
    return xp.where(img > limit, 1.055 * xp.maximum(img, limit) ** (1.0 / 2.4) - 0.055, 12.92 * img)


def read_image(path: str, to_linear: bool = False) -> np.ndarray:
    """Read png/jpg/exr -> float32 (H, W, C). LDR images are returned in
    [0,1] sRGB unless to_linear; EXR is linear already."""
    path = str(path)
    if path.lower().endswith(".exr"):
        img, _ = read_exr(path)
        return img
    from PIL import Image

    img = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    if to_linear:
        if img.shape[-1] == 4:
            img = np.concatenate([srgb_to_linear(img[..., :3]), img[..., 3:]], -1)
        else:
            img = srgb_to_linear(img)
    return img


def write_image(path: str, img: np.ndarray, from_linear: bool = False):
    """Write float image (values clipped to [0,1]) as PNG/JPG."""
    from PIL import Image

    img = np.asarray(img)
    if from_linear:
        if img.shape[-1] == 4:
            img = np.concatenate([linear_to_srgb(img[..., :3]), img[..., 3:]], -1)
        else:
            img = linear_to_srgb(img)
    img8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img8).save(path)
