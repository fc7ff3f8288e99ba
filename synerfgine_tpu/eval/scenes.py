"""Named-scene registry.

Capability match for scripts/scenes.py (reference): maps short names
("lego", "fox", "albert", ...) to data directories, train/test
transforms, and the eval cadence, so CLI commands accept a name instead
of a path. Roots are overridable via SYNERFGINE_DATA (defaults to the
reference checkout's data/ so the shipped scenes work out of the box).
"""
from __future__ import annotations

import os
import pathlib

DATA_ROOT = pathlib.Path(os.environ.get(
    "SYNERFGINE_DATA", "/root/reference/data"))

_SYNTHETIC = ("lego", "drums", "ship", "mic", "ficus", "chair", "hotdog",
              "materials")


def _nerf_synthetic(name: str) -> dict:
    return {
        "data_dir": str(DATA_ROOT / "nerf_synthetic" / name),
        "dataset_train": "transforms_train.json",
        "dataset_test": "transforms_test.json",
        "test_every": 0,          # explicit test split
        "frameidx": 52,
    }


def _ours(rel: str, frameidx: int = 0, test_every: int = 5) -> dict:
    return {
        "data_dir": str(DATA_ROOT / "nerf" / rel),
        "dataset_train": "transforms.json",
        "dataset_test": "transforms.json",
        "test_every": test_every,
        "frameidx": frameidx,
    }


scenes_nerf: dict[str, dict] = {
    "fox": _ours("fox"),
    # the repo ships a lego subset under data/nerf/lego with a single
    # transforms.json (held-out split via test_every)
    "lego-mini": _ours("lego", frameidx=52, test_every=8),
    **{name: _nerf_synthetic(name) for name in _SYNTHETIC},
}

scenes_image = {
    "albert": {"data_dir": str(DATA_ROOT / "image"), "dataset": "albert.exr"},
}

scenes_sdf = {
    "armadillo": {"data_dir": str(DATA_ROOT / "sdf"), "dataset": "armadillo.obj"},
}


def resolve_scene(name_or_path: str, mode: str = "nerf") -> dict:
    """A registered name -> its entry; anything else -> treat as a path."""
    reg = {"nerf": scenes_nerf, "image": scenes_image,
           "sdf": scenes_sdf}[mode]
    if name_or_path in reg:
        return dict(reg[name_or_path])
    p = pathlib.Path(name_or_path)
    return {"data_dir": str(p), "dataset_train": "transforms.json",
            "dataset_test": "transforms.json", "test_every": 8,
            "frameidx": 0}
