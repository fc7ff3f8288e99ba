"""NeRFCapture-app dataset writer.

Capability match for scripts/nerfcapture2nerf.py (reference): the app
streams frames (rgb, optional depth, pose, intrinsics) over DDS; the
script's `dataset_capture_loop` writes them to disk as an NGP dataset.
The transport (cyclonedds) is environment-specific and not available
here, so this module implements the dataset-writing core with a plain
frame-dict interface; a live loop can feed it from any transport.

Frame dict fields (what the app publishes): "image" (H, W, 3) uint8,
optional "depth" (H, W) float meters, "transform_matrix" 4x4 c2w,
"fl_x","fl_y","cx","cy".
"""
from __future__ import annotations

import json
import pathlib

import numpy as np


class NerfCaptureWriter:
    def __init__(self, save_path: str | pathlib.Path, overwrite: bool = False,
                 aabb_scale: int = 16, depth_scale: float = 10.0):
        self.path = pathlib.Path(save_path)
        if self.path.exists():
            if not overwrite and any(self.path.iterdir()):
                raise FileExistsError(
                    f"{self.path} exists; pass overwrite=True")
            # overwrite: clear any previous capture's images so a shorter
            # new capture can't leave stale images/<idx>.png behind
            if overwrite and (self.path / "images").exists():
                import shutil

                shutil.rmtree(self.path / "images")
        (self.path / "images").mkdir(parents=True, exist_ok=True)
        self.aabb_scale = aabb_scale
        # reference stores depth as uint16 PNG in 1/depth_scale units
        self.depth_scale = depth_scale
        self.frames: list[dict] = []

    def add_frame(self, frame: dict):
        from PIL import Image

        idx = len(self.frames)
        name = f"images/{idx}.png"
        Image.fromarray(np.asarray(frame["image"], np.uint8)).save(
            self.path / name)
        entry = {
            "file_path": name,
            "transform_matrix": np.asarray(
                frame["transform_matrix"], np.float64).tolist(),
            "fl_x": float(frame["fl_x"]), "fl_y": float(frame["fl_y"]),
            "cx": float(frame["cx"]), "cy": float(frame["cy"]),
            "w": int(np.asarray(frame["image"]).shape[1]),
            "h": int(np.asarray(frame["image"]).shape[0]),
        }
        if frame.get("depth") is not None:
            dname = f"images/{idx}.depth.png"
            # store d16 = depth * 65535 / depth_scale so decoding with
            # integer_depth_scale = depth_scale / 65535 round-trips to
            # metric depth exactly (reference nerfcapture2nerf.py:192)
            d16 = (np.asarray(frame["depth"], np.float32)
                   * 65535.0 / self.depth_scale)
            Image.fromarray(np.clip(d16, 0, 65535).astype(np.uint16)).save(
                self.path / dname)
            entry["depth_path"] = dname
        self.frames.append(entry)

    def finalize(self) -> str:
        if not self.frames:
            raise ValueError("no frames captured")
        f0 = self.frames[0]
        transforms = {
            "fl_x": f0["fl_x"], "fl_y": f0["fl_y"],
            "cx": f0["cx"], "cy": f0["cy"], "w": f0["w"], "h": f0["h"],
            "camera_angle_x": float(
                2 * np.arctan(f0["w"] / (2 * f0["fl_x"]))),
            "aabb_scale": self.aabb_scale,
            "scale": 1.0,
            "integer_depth_scale": self.depth_scale / 65535.0,
            "frames": self.frames,
        }
        out = self.path / "transforms.json"
        out.write_text(json.dumps(transforms, indent=2))
        return str(out)


def live_capture(save_path, n_frames: int, overwrite: bool = False):
    """Reference's live DDS loop. Requires cyclonedds (not bundled)."""
    try:
        import cyclonedds  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "live NeRFCapture streaming needs cyclonedds; use "
            "NerfCaptureWriter with your own transport instead") from e
    raise NotImplementedError("wire a DDS reader to NerfCaptureWriter")
