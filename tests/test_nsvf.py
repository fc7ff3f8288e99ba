import json
import numpy as np

from synerfgine_tpu.data.nsvf import nsvf_to_transforms
from synerfgine_tpu.data import load_nerf_dataset


def _write_nsvf(tmp_path, n=3):
    (tmp_path / "pose").mkdir()
    (tmp_path / "rgb").mkdir()
    (tmp_path / "intrinsics.txt").write_text(
        "500 0 320 0\n0 500 240 0\n0 0 1 0\n0 0 0 1\n")
    from PIL import Image

    for i in range(n):
        m = np.eye(4)
        m[:3, 3] = [i * 0.1, 0.0, -2.0]
        np.savetxt(tmp_path / "pose" / f"0_{i:04d}.txt", m)
        Image.new("RGB", (640, 480), (i * 40, 0, 0)).save(
            tmp_path / "rgb" / f"0_{i:04d}.png")


def test_nsvf_conversion_and_load(tmp_path):
    _write_nsvf(tmp_path)
    out = tmp_path / "transforms.json"
    meta = nsvf_to_transforms(str(tmp_path), str(out))
    assert meta["fl_x"] == 500.0
    assert meta["w"] == 640
    assert len(meta["frames"]) == 3
    # and the generated transforms loads through the normal pipeline
    ds = load_nerf_dataset(str(out))
    assert ds.n_images == 3
    assert ds.images.shape[1:3] == (480, 640)
