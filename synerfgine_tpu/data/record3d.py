"""Record3D capture -> transforms.json converter.

Capability match for scripts/record3d2nerf.py (reference): reads the
capture's `metadata` json ([qx,qy,qz,qw,tx,ty,tz] poses + K intrinsics,
images in rgbd/<idx>.jpg), optionally rotates portrait captures upright,
then re-centers/rescales poses to "nerf size" (closest point to all
optical axes at the origin, average camera distance 4).
"""
from __future__ import annotations

import json
import pathlib

import numpy as np

from .colmap import _closest_point_to_rays


def _quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """[qx, qy, qz, qw] -> 3x3 rotation."""
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def _rot_z(deg: float) -> np.ndarray:
    r = np.deg2rad(deg)
    m = np.eye(4)
    m[0, 0] = m[1, 1] = np.cos(r)
    m[0, 1] = -np.sin(r)
    m[1, 0] = np.sin(r)
    # reference rotates about -z
    return np.linalg.inv(m)


def _swap_axes() -> np.ndarray:
    r = np.pi / 2
    m = np.eye(4)
    m[1, 1] = m[2, 2] = np.cos(r)
    m[1, 2] = -np.sin(r)
    m[2, 1] = np.sin(r)
    return m


def center_and_scale_frames(frames: list[dict]) -> tuple[np.ndarray, float]:
    """Reference's find_transforms_center_and_scale: subtract the point
    closest to all optical (z) axes, scale avg camera distance to 4."""
    mats = np.array([f["transform_matrix"] for f in frames], np.float64)
    center = _closest_point_to_rays(mats[:, :3, 3], mats[:, :3, 2])
    avg = float(np.mean(np.linalg.norm(mats[:, :3, 3] - center, axis=-1)))
    return center, 4.0 / max(avg, 1e-9)


def record3d_to_transforms(
    scene_dir: str | pathlib.Path,
    rotate: bool = False,
    subsample: int = 1,
    aabb_scale: int = 16,
) -> dict:
    """Build the transforms dict; does not itself touch image files.
    With rotate=True the returned poses/intrinsics assume the jpgs HAVE
    been rotated upright — `record3d_to_nerf` calls
    `rotate_images_inplace` first (the reference rewrites rotated jpgs in
    place, record3d2nerf.py:112)."""
    scene_dir = pathlib.Path(scene_dir)
    metadata = json.loads((scene_dir / "metadata").read_text())
    poses = np.asarray(metadata["poses"], np.float64)
    images = sorted((scene_dir / "rgbd").glob("*.jpg"),
                    key=lambda p: int(p.stem))
    frames = []
    for idx, img in enumerate(images):
        pose = poses[idx]
        c2w = np.eye(4)
        c2w[:3, :3] = _quat_to_matrix(pose[:4])
        c2w[:3, 3] = pose[4:7]
        if rotate:
            c2w = _swap_axes() @ (c2w @ _rot_z(90))
        frames.append({
            "file_path": f"./rgbd/{img.name}",
            "transform_matrix": c2w.tolist(),
        })
    frames = frames[::subsample]

    K = np.asarray(metadata["K"], np.float64).reshape(3, 3).T
    if not rotate:
        h, w = metadata["h"], metadata["w"]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    else:
        h, w = metadata["w"], metadata["h"]
        fx, fy, cx, cy = K[1, 1], K[0, 0], K[1, 2], metadata["w"] - K[0, 2]

    center, scale = center_and_scale_frames(frames)
    for f in frames:
        m = np.asarray(f["transform_matrix"])
        m[:3, 3] = (m[:3, 3] - center) * scale
        f["transform_matrix"] = m.tolist()

    return {
        "fl_x": fx, "fl_y": fy, "cx": cx, "cy": cy, "w": w, "h": h,
        "aabb_scale": aabb_scale, "scale": 1.0,
        "camera_angle_x": float(2 * np.arctan(w / (2 * fx))),
        "camera_angle_y": float(2 * np.arctan(h / (2 * fy))),
        "frames": frames,
    }


def rotate_images_inplace(scene_dir: str | pathlib.Path, degree: int = 90):
    """Rotate every rgbd/*.jpg in place (reference rotate_img: PIL
    rotate(90, expand=1), i.e. portrait -> landscape counterclockwise,
    saved at quality 100). Must accompany rotate=True so the pixel files
    agree with the rotated poses/intrinsics."""
    from PIL import Image

    for p in sorted(pathlib.Path(scene_dir).glob("rgbd/*.jpg")):
        img = Image.open(p)
        img = img.rotate(degree, expand=1)
        img.save(p, quality=100, subsampling=0)


def record3d_to_nerf(scene_dir, rotate: bool = False, subsample: int = 1,
                     out: str | None = None) -> str:
    if rotate:
        # keep pixels consistent with the rotated poses/intrinsics: the
        # transforms math assumes upright (rotated) images
        rotate_images_inplace(scene_dir)
    t = record3d_to_transforms(scene_dir, rotate, subsample)
    out = out or str(pathlib.Path(scene_dir) / "transforms.json")
    with open(out, "w") as f:
        json.dump(t, f, indent=2)
    return out
