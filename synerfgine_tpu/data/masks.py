"""Training-image masks.

Capability match for scripts/mask_images.py (reference): writes
`dynamic_mask_<name>.png` files next to training images; the dataset
loader zeroes the loss in masked regions (the reference's nerf_loader
reads the same convention). The reference auto-segments with detectron2
(a GPU download at runtime); that external-model step is out of scope
here — masks come from any segmentation tool or from the simple
chroma-key helper below.
"""
from __future__ import annotations

import pathlib

import numpy as np

MASK_PREFIX = "dynamic_mask_"


def write_mask(image_path: str | pathlib.Path, mask: np.ndarray) -> str:
    """mask: (H, W) bool/float, True/1 = masked OUT of training."""
    from PIL import Image

    p = pathlib.Path(image_path)
    out = p.parent / f"{MASK_PREFIX}{p.stem}.png"
    m8 = (np.clip(np.asarray(mask, np.float32), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(m8).save(out)
    return str(out)


def mask_path_for(image_path: str | pathlib.Path) -> pathlib.Path:
    p = pathlib.Path(image_path)
    return p.parent / f"{MASK_PREFIX}{p.stem}.png"


def load_mask(image_path: str | pathlib.Path) -> np.ndarray | None:
    """(H, W) float in [0,1] (1 = masked out), or None if absent."""
    mp = mask_path_for(image_path)
    if not mp.exists():
        return None
    from PIL import Image

    m = np.asarray(Image.open(mp)).astype(np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    return m / 255.0


def chroma_key_mask(img: np.ndarray, color=(0.0, 1.0, 0.0),
                    tol: float = 0.25) -> np.ndarray:
    """Mask pixels within `tol` (L2 in rgb) of `color`."""
    img = np.asarray(img, np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    d = np.linalg.norm(img[..., :3] - np.asarray(color, np.float32), axis=-1)
    return d < tol


def mask_images(image_dir: str | pathlib.Path, masks_dir: str | pathlib.Path,
                exts=(".png", ".jpg", ".jpeg")) -> int:
    """Copy externally-produced masks (same stem) into the
    dynamic_mask_ convention. Returns count written."""
    from PIL import Image

    image_dir = pathlib.Path(image_dir)
    masks_dir = pathlib.Path(masks_dir)
    n = 0
    for img in sorted(image_dir.iterdir()):
        if img.suffix.lower() not in exts or img.stem.startswith(MASK_PREFIX):
            continue
        for ext in exts:
            src = masks_dir / (img.stem + ext)
            if src.exists():
                m = np.asarray(Image.open(src)).astype(np.float32)
                if m.ndim == 3:
                    m = m[..., 0]
                write_mask(img, m / max(m.max(), 1.0))
                n += 1
                break
    return n
