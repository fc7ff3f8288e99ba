"""NSVF dataset dialect -> transforms.json (nsvf2nerf equivalent).

The NSVF layout (used by the reference's nsvf2nerf converter and by
`load_nerf`'s NSVF branch, nerf_loader.cu): an `intrinsics.txt` with the
pinhole matrix, a `pose/` directory of per-image 4x4 camera-to-world
matrices (OpenGL convention like NeRF-synthetic), and `rgb/` images.
"""
from __future__ import annotations

import json
import pathlib

import numpy as np


def nsvf_to_transforms(root: str, out_path: str | None = None,
                       aabb_scale: int = 1) -> dict:
    root_p = pathlib.Path(root)
    intr = np.loadtxt(root_p / "intrinsics.txt").reshape(-1)
    # common layouts: full 4x4/3x3 matrix, or "f cx cy 0" first line
    if intr.size >= 9:
        fl_x = intr[0]
        fl_y = intr[4] if intr.size >= 16 else intr[4]
        cx, cy = intr[2], intr[5] if intr.size >= 16 else intr[5]
    else:
        fl_x = fl_y = intr[0]
        cx, cy = intr[1], intr[2]

    poses = sorted((root_p / "pose").glob("*.txt"))
    rgb_dir = root_p / "rgb"
    frames = []
    for p in poses:
        m = np.loadtxt(p).reshape(4, 4)
        stem = p.stem
        img = None
        for ext in (".png", ".jpg", ".jpeg"):
            cand = rgb_dir / (stem + ext)
            if cand.exists():
                img = cand
                break
        if img is None:
            matches = list(rgb_dir.glob(stem + ".*"))
            if matches:
                img = matches[0]
        if img is None:
            continue
        frames.append({
            "file_path": str(img.relative_to(root_p)),
            "transform_matrix": m.tolist(),
        })

    if not frames:
        raise ValueError(f"no NSVF frames under {root}")
    # infer image size from the first image
    from PIL import Image

    with Image.open(root_p / frames[0]["file_path"]) as im:
        w, h = im.size
    meta = {
        "w": w, "h": h, "fl_x": float(fl_x), "fl_y": float(fl_y),
        "cx": float(cx), "cy": float(cy),
        "camera_angle_x": float(2 * np.arctan(w / (2 * fl_x))),
        "aabb_scale": aabb_scale,
        "frames": frames,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(meta, f, indent=2)
    return meta
