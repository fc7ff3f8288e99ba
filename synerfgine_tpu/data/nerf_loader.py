"""NeRF dataset loader: transforms.json + images -> NGP-space dataset.

Capability match for the reference's `NerfDataset`/`load_nerf`
(nerf_loader.h:49-169, nerf_loader.cu:273): parses the instant-ngp
transforms.json dialect (camera_angle_x or fl_x/fl_y, optional cx/cy,
k1/k2/p1/p2 distortion -> Lens, aabb_scale, scale, offset, per-frame
transform_matrix, per-frame intrinsics overrides, per-frame depth maps),
converts camera-to-world matrices to NGP convention (axis cycle + y/z
flip + scale/offset) and loads images.

Per-image metadata (reference TrainingImageMetadata, nerf_loader.h:45-60):
`focals` (N, 2) and `pps` (N, 2) carry per-frame focal/principal-point
overrides (nerf_loader.cu:695 read_lens per-frame override). Unlike the
reference, image *resolution* is unified at load: frames whose pixel
dims differ from the first frame are resized to it with intrinsics scaled
to match — a static-shape (N, H, W, 4) tensor is what makes the TPU
training sampler one gather instead of per-image control flow.

Depth maps (nerf_loader.cu:625-630): frames with "depth_path" load
uint16 PNGs scaled by the dataset's "integer_depth_scale" into metric
`depths` (N, H, W); 0 marks pixels without depth.

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
from ..core.lens import Lens, lens_from_transforms


@dataclasses.dataclass
class NerfDataset:
    images: np.ndarray          # (N, H, W, 4) uint8, sRGB + straight alpha
    xforms: np.ndarray          # (N, 3, 4) float32, NGP convention
    resolution: tuple[int, int]  # (W, H)
    focal_length: np.ndarray    # (2,) float32 pixels (dataset default)
    principal_point: np.ndarray  # (2,) float32 in [0,1] (dataset default)
    aabb_scale: int = 1
    scale: float = NERF_SCALE
    offset: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.5, 0.5, 0.5], np.float32))
    distortion: np.ndarray | None = None  # (4,) k1 k2 p1 p2 if present
    lens: Lens = dataclasses.field(default_factory=Lens)
    focals: np.ndarray | None = None      # (N, 2) per-image focal override
    pps: np.ndarray | None = None         # (N, 2) per-image principal point
    # rolling shutter / motion blur (TrainingXForm start/end + vec4
    # rolling_shutter, nerf_loader.cu:204-215, common_device.cuh:363):
    xforms_end: np.ndarray | None = None  # (N, 3, 4); None = static frames
    rolling_shutter: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(4, np.float32))
    depths: np.ndarray | None = None      # (N, H, W) metric depth, 0 = none
    masks: np.ndarray | None = None       # (N, H, W) in [0,1], 1 = excluded
    paths: list = dataclasses.field(default_factory=list)

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    @property
    def per_image_focals(self) -> np.ndarray:
        """(N, 2) focal for every image (override or broadcast default)."""
        if self.focals is not None:
            return self.focals
        return np.broadcast_to(self.focal_length, (self.n_images, 2))

    @property
    def per_image_pps(self) -> np.ndarray:
        if self.pps is not None:
            return self.pps
        return np.broadcast_to(self.principal_point, (self.n_images, 2))

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
            focals=self.focals[indices] if self.focals is not None else None,
            pps=self.pps[indices] if self.pps is not None else None,
            xforms_end=(self.xforms_end[indices]
                        if self.xforms_end is not None else None),
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


def _load_depth(base: pathlib.Path, fr: dict, depth_scale: float,
                size_wh: tuple[int, int]) -> np.ndarray | None:
    """uint16 depth PNG * integer_depth_scale -> metric depth
    (nerf_loader.cu:625-630)."""
    if depth_scale <= 0 or "depth_path" not in fr:
        return None
    p = base / fr["depth_path"]
    if not p.exists():
        return None
    from PIL import Image

    img = Image.open(p)
    if (img.width, img.height) != size_wh:
        img = img.resize(size_wh, Image.NEAREST)
    return np.asarray(img).astype(np.float32) * depth_scale


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
    depth_scale = float(meta.get("integer_depth_scale", 0.0))

    def load_one(fr):
        p = _resolve_image_path(base, fr["file_path"])
        if p is None:
            return None
        img = Image.open(p)
        native_w, native_h = img.width, img.height
        if downscale > 1:
            img = img.resize((img.width // downscale, img.height // downscale),
                             Image.LANCZOS)
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.shape[-1] == 3:
            arr = np.concatenate([arr, np.full_like(arr[..., :1], 255)], -1)
        raw_start = fr.get("transform_matrix_start",
                           fr.get("transform_matrix"))
        m_start = np.asarray(raw_start, np.float32)
        m_end = np.asarray(fr.get("transform_matrix_end", raw_start),
                           np.float32)
        m = m_start
        # dynamic_mask_<stem>.png convention (reference nerf_loader mask
        # handling / scripts/mask_images.py): 1 = excluded from training
        from .masks import load_mask

        mask = load_mask(p)
        if mask is not None and downscale > 1:
            mimg = Image.fromarray((mask * 255).astype(np.uint8)).resize(
                (arr.shape[1], arr.shape[0]), Image.BILINEAR)
            mask = np.asarray(mimg).astype(np.float32) / 255.0
        depth = _load_depth(base, fr, depth_scale,
                            (arr.shape[1], arr.shape[0]))
        return (arr.astype(np.uint8), nerf_matrix_to_ngp(m, scale, offset),
                str(p), mask, depth, (native_w, native_h), fr,
                nerf_matrix_to_ngp(m_end, scale, offset))

    # parallel decode (the reference loads images on a thread pool too,
    # N25 thread_pool.cpp / nerf_loader.cu async loading)
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = [r for r in ex.map(load_one, frames) if r is not None]
    images = [r[0] for r in results]
    xforms = [r[1] for r in results]
    paths = [r[2] for r in results]
    raw_masks = [r[3] for r in results]
    raw_depths = [r[4] for r in results]
    native_sizes = [r[5] for r in results]
    kept_frames = [r[6] for r in results]
    xforms_end = [r[7] for r in results]

    # unify mixed resolutions to the first frame's (static-shape tensor;
    # intrinsics of resized frames are scaled below via per-image focals)
    h, w = images[0].shape[:2]
    resize_scales = []
    for i, img in enumerate(images):
        if img.shape[:2] != (h, w):
            sy, sx = h / img.shape[0], w / img.shape[1]
            pil = Image.fromarray(img).resize((w, h), Image.LANCZOS)
            images[i] = np.asarray(pil).astype(np.uint8)
            if raw_depths[i] is not None:
                d = Image.fromarray(raw_depths[i]).resize((w, h),
                                                          Image.NEAREST)
                raw_depths[i] = np.asarray(d)
            resize_scales.append((sx, sy))
        else:
            resize_scales.append((1.0, 1.0))

    images = np.stack(images)
    masks = None
    if any(m is not None for m in raw_masks):
        masks = np.stack([
            m if m is not None else np.zeros((h, w), np.float32)
            for m in raw_masks]).astype(np.float32)
    depths = None
    if any(d is not None for d in raw_depths):
        depths = np.stack([
            np.asarray(d, np.float32) if d is not None
            else np.zeros((h, w), np.float32)
            for d in raw_depths])

    def focal_from(meta_or_frame, width, height, fallback=None):
        if "fl_x" in meta_or_frame:
            f = meta_or_frame
            return np.array([f["fl_x"], f.get("fl_y", f["fl_x"])], np.float32)
        if "camera_angle_x" in meta_or_frame:
            ca = meta_or_frame["camera_angle_x"]
            flx = 0.5 * width / np.tan(0.5 * ca)
            if "camera_angle_y" in meta_or_frame:
                fly = 0.5 * height / np.tan(
                    0.5 * meta_or_frame["camera_angle_y"])
            else:
                fly = flx
            return np.array([flx, fly], np.float32)
        return fallback

    native_w0, native_h0 = native_sizes[0]
    fl = focal_from(meta, native_w0, native_h0)
    if fl is None:
        fl = focal_from(kept_frames[0], native_w0, native_h0,
                        np.array([native_w0, native_w0], np.float32))
    fl = fl / downscale
    pp = np.array(
        [meta.get("cx", native_w0 / 2) / native_w0,
         meta.get("cy", native_h0 / 2) / native_h0],
        np.float32,
    )

    # per-frame intrinsics overrides (reference nerf_loader.cu:695
    # "see if there is a per-frame override")
    focals = pps = None
    has_override = any(
        any(k in fr for k in ("fl_x", "camera_angle_x", "cx", "cy"))
        for fr in kept_frames)
    if has_override or any(s != (1.0, 1.0) for s in resize_scales):
        focals = np.empty((len(kept_frames), 2), np.float32)
        pps = np.empty((len(kept_frames), 2), np.float32)
        for i, fr in enumerate(kept_frames):
            nw, nh = native_sizes[i]
            f_i = focal_from(fr, nw, nh, fl * downscale) / downscale
            sx, sy = resize_scales[i]
            focals[i] = f_i * np.array([sx, sy], np.float32)
            pps[i] = [fr.get("cx", meta.get("cx", nw / 2)) / nw,
                      fr.get("cy", meta.get("cy", nh / 2)) / nh]
        if (np.allclose(focals, fl) and np.allclose(pps, pp)):
            focals = pps = None  # overrides equal the defaults

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
        lens=lens_from_transforms(meta),
        focals=focals,
        pps=pps,
        xforms_end=(np.stack(xforms_end).astype(np.float32)
                    if any("transform_matrix_start" in fr
                           or "transform_matrix_end" in fr
                           for fr in kept_frames) else None),
        rolling_shutter=np.asarray(
            (list(meta.get("rolling_shutter", [0, 0, 0])) + [0.0])[:4]
            if len(meta.get("rolling_shutter", [0, 0, 0])) < 4
            else meta["rolling_shutter"][:4], np.float32),
        depths=depths,
        masks=masks,
        paths=paths,
    )
