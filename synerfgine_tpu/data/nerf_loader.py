"""NeRF dataset loader: transforms.json + images -> NGP-space dataset.

Capability match for the reference's `NerfDataset`/`load_nerf`
(nerf_loader.h:49-169, nerf_loader.cu:273): parses the instant-ngp
transforms.json dialect (camera_angle_x or fl_x/fl_y, optional cx/cy,
k1/k2/p1/p2 distortion, aabb_scale, scale, offset, per-frame
transform_matrix), converts camera-to-world matrices to NGP convention
(axis cycle + y/z flip + scale/offset) and loads images.

Color pipeline: the reference stores linear premultiplied-alpha texels and
reconstructs sRGB targets in the loss kernel
(testbed_nerf.cu:1122-1139: `linear_to_srgb(linear_rgb/a)*a + (1-a)*bg`).
For LDR inputs those conversions cancel: target == stored sRGB rgb
composited with straight alpha over the sRGB background. We therefore keep
images as uint8 sRGB + straight alpha and composite directly — identical
targets, no per-texel conversions.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

from ..core.camera import nerf_matrix_to_ngp
from ..core.constants import NERF_SCALE


@dataclasses.dataclass
class NerfDataset:
    images: np.ndarray          # (N, H, W, 4) uint8, sRGB + straight alpha
    xforms: np.ndarray          # (N, 3, 4) float32, NGP convention
    resolution: tuple[int, int]  # (W, H)
    focal_length: np.ndarray    # (2,) float32 pixels
    principal_point: np.ndarray  # (2,) float32 in [0,1]
    aabb_scale: int = 1
    scale: float = NERF_SCALE
    offset: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.5, 0.5, 0.5], np.float32))
    distortion: np.ndarray | None = None  # (4,) k1 k2 p1 p2 if present
    depths: np.ndarray | None = None      # (N, H, W) metric depth, 0 = none
    masks: np.ndarray | None = None       # (N, H, W) in [0,1], 1 = excluded
    paths: list = dataclasses.field(default_factory=list)

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    def train_test_split(self, test_every: int = 8):
        """Hold out every k-th view (the repo ships a single transforms.json
        with no test split; run.py-style eval needs held-out views)."""
        idx = np.arange(self.n_images)
        test = idx[::test_every]
        train = np.setdiff1d(idx, test)
        return self.subset(train), self.subset(test)

    def subset(self, indices) -> "NerfDataset":
        return dataclasses.replace(
            self,
            images=self.images[indices],
            xforms=self.xforms[indices],
            masks=self.masks[indices] if self.masks is not None else None,
            depths=self.depths[indices] if self.depths is not None else None,
            paths=[self.paths[i] for i in np.atleast_1d(indices)] if self.paths else [],
        )


def _resolve_image_path(base: pathlib.Path, file_path: str) -> pathlib.Path | None:
    p = base / file_path
    if p.exists():
        return p
    for ext in (".png", ".jpg", ".jpeg", ".exr"):
        q = p.with_suffix(ext)
        if q.exists():
            return q
    return None


def load_nerf_dataset(
    path: str | pathlib.Path,
    transforms_name: str = "transforms.json",
    downscale: int = 1,
    max_images: int | None = None,
) -> NerfDataset:
    """path: scene dir containing transforms.json, or the json itself."""
    path = pathlib.Path(path)
    json_path = path if path.suffix == ".json" else path / transforms_name
    base = json_path.parent
    with open(json_path) as f:
        meta = json.load(f)

    frames = meta["frames"]
    if max_images:
        frames = frames[:max_images]

    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    scale = float(meta.get("scale", NERF_SCALE))
    offset = np.asarray(meta.get("offset", [0.5, 0.5, 0.5]), np.float32)

    def load_one(fr):
        p = _resolve_image_path(base, fr["file_path"])
        if p is None:
            return None
        img = Image.open(p)
        if downscale > 1:
            img = img.resize((img.width // downscale, img.height // downscale),
                             Image.LANCZOS)
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.shape[-1] == 3:
            arr = np.concatenate([arr, np.full_like(arr[..., :1], 255)], -1)
        m = np.asarray(fr["transform_matrix"], np.float32)
        # dynamic_mask_<stem>.png convention (reference nerf_loader mask
        # handling / scripts/mask_images.py): 1 = excluded from training
        from .masks import load_mask

        mask = load_mask(p)
        if mask is not None and downscale > 1:
            mimg = Image.fromarray((mask * 255).astype(np.uint8)).resize(
                (arr.shape[1], arr.shape[0]), Image.BILINEAR)
            mask = np.asarray(mimg).astype(np.float32) / 255.0
        return (arr.astype(np.uint8), nerf_matrix_to_ngp(m, scale, offset),
                str(p), mask)

    # parallel decode (the reference loads images on a thread pool too,
    # N25 thread_pool.cpp / nerf_loader.cu async loading)
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = [r for r in ex.map(load_one, frames) if r is not None]
    images = [r[0] for r in results]
    xforms = [r[1] for r in results]
    paths = [r[2] for r in results]
    raw_masks = [r[3] for r in results]

    images = np.stack(images)
    h, w = images.shape[1:3]
    masks = None
    if any(m is not None for m in raw_masks):
        masks = np.stack([
            m if m is not None else np.zeros((h, w), np.float32)
            for m in raw_masks]).astype(np.float32)

    if "fl_x" in meta:
        fl = np.array([meta["fl_x"], meta.get("fl_y", meta["fl_x"])], np.float32)
        fl = fl / downscale
    else:
        ca = meta["camera_angle_x"]
        flx = 0.5 * w / np.tan(0.5 * ca)
        fl = np.array([flx, flx], np.float32)
    pp = np.array(
        [meta.get("cx", w * downscale / 2) / (w * downscale),
         meta.get("cy", h * downscale / 2) / (h * downscale)],
        np.float32,
    )
    dist = None
    if any(k in meta for k in ("k1", "k2", "p1", "p2")):
        dist = np.array([meta.get("k1", 0.0), meta.get("k2", 0.0),
                         meta.get("p1", 0.0), meta.get("p2", 0.0)], np.float32)

    return NerfDataset(
        images=images,
        xforms=np.stack(xforms).astype(np.float32),
        resolution=(w, h),
        focal_length=fl,
        principal_point=pp,
        aabb_scale=int(meta.get("aabb_scale", 1)),
        scale=scale,
        offset=offset,
        distortion=dist,
        masks=masks,
        paths=paths,
    )
