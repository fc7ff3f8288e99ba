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


def read_bin_image(path: str) -> np.ndarray:
    """Read the reference's raw '.bin' image format (scripts/common.py:148):
    int32 (H, W) header then fp16 RGBA, linear color. Used for gigapixel
    image-mode inputs that are slow to decode from PNG/JPG."""
    with open(path, "rb") as f:
        import struct

        h, w = struct.unpack("ii", f.read(8))
        data = np.frombuffer(f.read(), np.float16)
    return data.reshape(h, w, 4).astype(np.float32)


def write_bin_image(path: str, img: np.ndarray):
    """Write the '.bin' format (scripts/common.py:163): pads to RGBA with
    alpha 1, fp16 payload."""
    import struct

    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[2] < 4:
        pad = np.ones(img.shape[:2] + (4 - img.shape[2],), np.float32)
        img = np.dstack([img, pad])
    with open(path, "wb") as f:
        f.write(struct.pack("ii", img.shape[0], img.shape[1]))
        f.write(img.astype(np.float16).tobytes())


def read_image(path: str, to_linear: bool = False) -> np.ndarray:
    """Read png/jpg/exr/bin -> float32 (H, W, C). LDR images are returned
    in [0,1] sRGB unless to_linear; EXR and .bin are linear already."""
    path = str(path)
    if path.lower().endswith(".exr"):
        img, _ = read_exr(path)
        return img
    if path.lower().endswith(".bin"):
        return read_bin_image(path)
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
