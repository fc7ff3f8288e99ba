"""Generate an orbit camera path JSON for demo videos (the reference's
CameraPath keyframe files, camera_path.h:33-126; consumed by
`cli render --camera-path`).

Usage: python scripts/make_demo_path.py [out.json] [--n 12] [--radius 1.3]
       [--height 0.35] [--center 0.5,0.5,0.5]
"""
from __future__ import annotations

import argparse
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from synerfgine_tpu.core import camera as cam  # noqa: E402
from synerfgine_tpu.render.camera_path import (  # noqa: E402
    CameraKeyframe,
    CameraPath,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/orbit_path.json")
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--radius", type=float, default=1.3)
    ap.add_argument("--height", type=float, default=0.35)
    ap.add_argument("--center", default="0.5,0.5,0.5")
    args = ap.parse_args()

    center = np.array([float(v) for v in args.center.split(",")])
    path = CameraPath()
    for i in range(args.n + 1):          # closed loop: last == first angle
        th = 2.0 * np.pi * i / args.n
        eye = center + np.array([
            args.radius * np.cos(th), args.height,
            args.radius * np.sin(th)])
        m = cam.look_at(eye, center)
        path.add(CameraKeyframe.from_matrix(
            np.asarray(m), timestamp=i / args.n))
    path.save(args.out)
    print(f"wrote {args.n + 1}-keyframe orbit to {args.out}")


if __name__ == "__main__":
    main()
