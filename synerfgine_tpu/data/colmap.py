"""COLMAP -> transforms.json converter (colmap2nerf equivalent).

Capability match for scripts/colmap2nerf.py: parses a COLMAP sparse text
model (cameras.txt / images.txt), inverts world-to-camera poses,
converts COLMAP's (right, down, forward) camera axes to the NeRF
(right, up, back) convention, centers the scene at the least-squares
closest point of all camera optical axes and rescales so the average
camera distance is 4 (the reference's normalization), then writes the
instant-ngp transforms.json dialect.
"""
from __future__ import annotations

import json
import pathlib

import numpy as np

from ..core import se3


def _parse_cameras(path: pathlib.Path) -> dict[int, dict]:
    cams = {}
    for line in path.read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        w, h = int(parts[2]), int(parts[3])
        p = [float(x) for x in parts[4:]]
        if model == "SIMPLE_PINHOLE":
            fl_x = fl_y = p[0]
            cx, cy = p[1], p[2]
            k = {}
        elif model == "PINHOLE":
            fl_x, fl_y, cx, cy = p[:4]
            k = {}
        elif model in ("SIMPLE_RADIAL", "RADIAL"):
            fl_x = fl_y = p[0]
            cx, cy = p[1], p[2]
            k = {"k1": p[3], "k2": p[4] if model == "RADIAL" else 0.0}
        elif model == "OPENCV":
            fl_x, fl_y, cx, cy = p[:4]
            k = {"k1": p[4], "k2": p[5], "p1": p[6], "p2": p[7]}
        else:
            raise ValueError(f"unsupported COLMAP camera model {model}")
        cams[cam_id] = {"w": w, "h": h, "fl_x": fl_x, "fl_y": fl_y,
                        "cx": cx, "cy": cy, **k}
    return cams


def _parse_images(path: pathlib.Path):
    """Yields (name, camera_id, qvec (w,x,y,z), tvec)."""
    out = []
    # keep blank lines: the per-image 2D-points line may be empty but is
    # still part of the 2-line record
    lines = [l for l in path.read_text().splitlines()
             if not l.startswith("#")]
    for i in range(0, len(lines) - len(lines) % 2, 2):
        parts = lines[i].split()
        q = np.array([float(x) for x in parts[1:5]])
        t = np.array([float(x) for x in parts[5:8]])
        cam_id = int(parts[8])
        name = parts[9]
        out.append((name, cam_id, q, t))
    return out


def _closest_point_to_rays(origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Least-squares point minimizing distance to all rays."""
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for o, d in zip(origins, dirs):
        d = d / np.linalg.norm(d)
        M = np.eye(3) - np.outer(d, d)
        A += M
        b += M @ o
    return np.linalg.solve(A + 1e-9 * np.eye(3), b)


def colmap_to_transforms(
    sparse_dir: str,
    images_rel: str = "images",
    out_path: str | None = None,
    aabb_scale: int = 4,
) -> dict:
    sparse = pathlib.Path(sparse_dir)
    cams = _parse_cameras(sparse / "cameras.txt")
    images = _parse_images(sparse / "images.txt")
    if not images:
        raise ValueError("no images in COLMAP model")

    c2ws, names, cam_ids = [], [], []
    for name, cam_id, q, t in images:
        R = np.asarray(se3.quat_to_matrix(q / np.linalg.norm(q)))
        # COLMAP stores world->camera; invert
        c2w_R = R.T
        c2w_t = -R.T @ t
        # COLMAP camera: x right, y down, z forward; NeRF: x right, y up,
        # z backward => negate the y and z basis columns
        m = np.eye(4)
        m[:3, :3] = c2w_R @ np.diag([1.0, -1.0, -1.0])
        m[:3, 3] = c2w_t
        c2ws.append(m)
        names.append(name)
        cam_ids.append(cam_id)

    pos = np.stack([m[:3, 3] for m in c2ws])
    fwd = np.stack([-m[:3, 2] for m in c2ws])  # NeRF forward = -z column
    center = _closest_point_to_rays(pos, fwd)
    avg = float(np.mean(np.linalg.norm(pos - center, axis=-1)))
    scale = 4.0 / max(avg, 1e-9)

    cam0 = cams[cam_ids[0]]
    meta = {
        "w": cam0["w"], "h": cam0["h"],
        "fl_x": cam0["fl_x"], "fl_y": cam0["fl_y"],
        "cx": cam0["cx"], "cy": cam0["cy"],
        "camera_angle_x": 2 * np.arctan(cam0["w"] / (2 * cam0["fl_x"])),
        "aabb_scale": aabb_scale,
        "frames": [],
    }
    for k in ("k1", "k2", "p1", "p2"):
        if cam0.get(k):
            meta[k] = cam0[k]
    for m, name in zip(c2ws, names):
        m2 = m.copy()
        m2[:3, 3] = (m[:3, 3] - center) * scale
        meta["frames"].append({
            "file_path": str(pathlib.Path(images_rel) / name),
            "transform_matrix": m2.tolist(),
        })
    if out_path:
        with open(out_path, "w") as f:
            json.dump(meta, f, indent=2)
    return meta
