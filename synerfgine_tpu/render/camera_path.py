"""Camera paths.

- `CameraPath`: quaternion keyframes + Catmull-Rom spline evaluation —
  capability match for camera_path.h:33-126 (testbed's editor path,
  json save/load, video render settings).
- `SngCamPath`: the hybrid engine's simpler view/at/zoom linear keyframe
  player with fps pacing and `end_on_loop` (synerfgine/cam_path.cuh:30-152).
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np

from ..core import se3
from ..core.camera import look_at


@dataclasses.dataclass
class CameraKeyframe:
    R: np.ndarray            # quaternion (w, x, y, z)
    T: np.ndarray            # position (3,)
    fov: float = 50.0
    aperture_size: float = 0.0
    timestamp: float = 0.0

    @staticmethod
    def from_matrix(m, fov=50.0, aperture_size=0.0, timestamp=0.0):
        m = np.asarray(m, np.float32)
        q = np.asarray(se3.matrix_to_quat(m[:3, :3]))
        return CameraKeyframe(q, m[:3, 3].copy(), fov, aperture_size, timestamp)

    def to_matrix(self) -> np.ndarray:
        R = np.asarray(se3.quat_to_matrix(self.R))
        return np.concatenate([R, self.T[:, None]], axis=1).astype(np.float32)


def catmull_rom(p0, p1, p2, p3, t):
    """Standard centripetal-free Catmull-Rom on vectors."""
    t2, t3 = t * t, t * t * t
    return 0.5 * (
        (2 * p1)
        + (-p0 + p2) * t
        + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
        + (-p0 + 3 * p1 - 3 * p2 + p3) * t3
    )


class CameraPath:
    def __init__(self, keyframes: list[CameraKeyframe] | None = None,
                 loop: bool = False):
        self.keyframes = keyframes or []
        self.loop = loop

    def add(self, kf: CameraKeyframe):
        self.keyframes.append(kf)

    def _kf(self, i: int) -> CameraKeyframe:
        n = len(self.keyframes)
        if self.loop:
            return self.keyframes[i % n]
        return self.keyframes[min(max(i, 0), n - 1)]

    def eval(self, u: float) -> CameraKeyframe:
        """u in [0, 1] across the whole path; Catmull-Rom position/fov,
        slerp between adjacent quaternions (camera_path.h eval behavior)."""
        n = len(self.keyframes)
        if n == 0:
            raise ValueError("empty camera path")
        if n == 1:
            return self.keyframes[0]
        seg = u * (n - (0 if self.loop else 1))
        i = int(np.floor(seg))
        t = seg - i
        k0, k1, k2, k3 = (self._kf(i - 1), self._kf(i), self._kf(i + 1),
                          self._kf(i + 2))
        import jax.numpy as jnp

        q = np.asarray(se3.quat_slerp(jnp.asarray(k1.R), jnp.asarray(k2.R), t))
        T = catmull_rom(k0.T, k1.T, k2.T, k3.T, t)
        fov = catmull_rom(k0.fov, k1.fov, k2.fov, k3.fov, t)
        ap = catmull_rom(k0.aperture_size, k1.aperture_size, k2.aperture_size,
                         k3.aperture_size, t)
        return CameraKeyframe(q, np.asarray(T, np.float32), float(fov), float(ap), u)

    def save(self, path: str):
        data = {
            "loop": self.loop,
            "path": [
                {"R": kf.R.tolist(), "T": kf.T.tolist(), "fov": kf.fov,
                 "aperture_size": kf.aperture_size}
                for kf in self.keyframes
            ],
        }
        with open(path, "w") as f:
            json.dump(data, f, indent=2)

    @staticmethod
    def load(path: str) -> "CameraPath":
        with open(path) as f:
            data = json.load(f)
        kfs = [
            CameraKeyframe(np.asarray(k["R"], np.float32),
                           np.asarray(k["T"], np.float32),
                           k.get("fov", 50.0), k.get("aperture_size", 0.0))
            for k in data["path"]
        ]
        return CameraPath(kfs, loop=data.get("loop", False))


@dataclasses.dataclass
class SngKeyframe:
    view: np.ndarray   # view direction (eye = at - normalize(view)*zoom)
    at: np.ndarray     # look-at target
    zoom: float = 1.0


class SngCamPath:
    """view/at/zoom linear interpolation at a fixed fps over total_time_ms,
    optionally exiting at the end of the first loop."""

    def __init__(self, keyframes: list[SngKeyframe], fps: float = 30.0,
                 total_time_ms: float = 5000.0, end_on_loop: bool = False):
        self.keyframes = keyframes
        self.fps = fps
        self.total_time_ms = total_time_ms
        self.end_on_loop = end_on_loop
        self.frame_idx = 0

    @property
    def n_frames(self) -> int:
        return max(1, int(round(self.total_time_ms / 1000.0 * self.fps)))

    def finished(self) -> bool:
        return self.end_on_loop and self.frame_idx >= self.n_frames

    def eval_frame(self, frame: int):
        """Returns (camera_matrix (3,4), zoom) for a frame index.

        Keyframe `view` is a view DIRECTION and `zoom` the eye distance:
        the reference interpolates view/at/zoom linearly then applies
        set_view_dir + set_look_at + set_scale (cam_path.cuh:30-39),
        which places the eye at `at - normalize(view) * zoom`."""
        n = len(self.keyframes)
        if n == 1:
            k = self.keyframes[0]
            view, at, zoom = k.view, k.at, k.zoom
        else:
            u = (frame % self.n_frames) / self.n_frames * n
            i = int(np.floor(u)) % n
            t = u - np.floor(u)
            a, b = self.keyframes[i], self.keyframes[(i + 1) % n]
            view = (1 - t) * a.view + t * b.view
            at = (1 - t) * a.at + t * b.at
            zoom = (1 - t) * a.zoom + t * b.zoom
        eye = at - view / max(np.linalg.norm(view), 1e-12) * zoom
        return look_at(eye, at), zoom

    def next_frame(self):
        m = self.eval_frame(self.frame_idx)
        self.frame_idx += 1
        return m

    @staticmethod
    def from_json(cfg: dict) -> "SngCamPath":
        kfs = []
        for k in cfg.get("path", []):
            kfs.append(SngKeyframe(
                view=np.asarray(k["view"], np.float32),
                at=np.asarray(k["at"], np.float32),
                zoom=float(k.get("zoom", 1.0)),
            ))
        if not kfs:
            kfs = [SngKeyframe(np.asarray(cfg.get("view", [1.0, 0.5, 0.5]), np.float32),
                               np.asarray(cfg.get("at", [0.5, 0.5, 0.5]), np.float32),
                               float(cfg.get("zoom", 1.0)))]
        return SngCamPath(
            kfs,
            fps=float(cfg.get("fps", 30.0)),
            total_time_ms=float(cfg.get("total_time_ms", 5000.0)),
            end_on_loop=bool(cfg.get("end_on_loop", False)),
        )
