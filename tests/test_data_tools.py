"""Dataset tools: .bin images, record3d converter, masks, scene registry."""
import json

import numpy as np
import pytest

from synerfgine_tpu.io.image import read_bin_image, write_bin_image


def test_bin_image_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.bin")
    write_bin_image(p, img)
    back = read_bin_image(p)
    assert back.shape == (7, 5, 4)
    np.testing.assert_allclose(back[..., :3], img, atol=1e-3)  # fp16
    np.testing.assert_allclose(back[..., 3], 1.0)


def test_read_image_dispatches_bin(tmp_path):
    from synerfgine_tpu.io.image import read_image

    img = np.ones((4, 4, 4), np.float32) * 0.5
    p = str(tmp_path / "y.bin")
    write_bin_image(p, img)
    assert read_image(p).shape == (4, 4, 4)


def test_record3d_converter(tmp_path):
    from PIL import Image

    from synerfgine_tpu.data.record3d import record3d_to_nerf

    scene = tmp_path / "cap"
    (scene / "rgbd").mkdir(parents=True)
    rng = np.random.default_rng(1)
    poses = []
    for i in range(6):
        Image.fromarray(
            rng.integers(0, 255, (32, 24, 3), dtype=np.uint8),
        ).save(scene / "rgbd" / f"{i}.jpg")
        # camera on a circle looking inward: qx qy qz qw tx ty tz
        a = 2 * np.pi * i / 6
        poses.append([0, np.sin(a / 2), 0, np.cos(a / 2),
                      3 * np.sin(a), 0.0, 3 * np.cos(a)])
    meta = {"poses": poses, "h": 32, "w": 24,
            "K": np.array([[20.0, 0, 0], [0, 21.0, 0],
                           [12.0, 16.0, 1.0]]).T.reshape(-1).tolist()}
    (scene / "metadata").write_text(json.dumps(meta))

    out = record3d_to_nerf(scene)
    t = json.loads(open(out).read())
    assert len(t["frames"]) == 6
    assert t["w"] == 24 and t["h"] == 32
    mats = np.array([f["transform_matrix"] for f in t["frames"]])
    # normalized: average camera distance from origin == 4
    d = np.linalg.norm(mats[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d.mean(), 4.0, rtol=1e-3)


def test_masks_into_loader_and_loss(tmp_path, lego_dir):
    import shutil

    import jax

    from synerfgine_tpu.core.config import (HashGridConfig, MLPConfig,
                                            NGPNetworkConfig)
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.data.masks import write_mask
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    # copy 2 lego frames into tmp and mask one fully out
    import pathlib
    src = pathlib.Path(lego_dir)
    meta = json.loads((src / "transforms.json").read_text())
    scene = tmp_path / "scene"
    scene.mkdir()
    frames = meta["frames"][:2]
    for fr in frames:
        rel = pathlib.Path(fr["file_path"])
        dst = scene / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        cand = src / rel
        if not cand.exists():
            cand = cand.with_suffix(".png")
            dst = dst.with_suffix(".png")
        shutil.copy(cand, dst)
    (scene / "transforms.json").write_text(json.dumps(
        {**meta, "frames": frames}))
    img0 = scene / pathlib.Path(frames[0]["file_path"])
    if not img0.exists():
        img0 = img0.with_suffix(".png")
    from PIL import Image
    w, h = Image.open(img0).size
    write_mask(img0, np.ones((h, w), np.float32))

    ds = load_nerf_dataset(scene, downscale=16)
    assert ds.masks is not None and ds.masks.shape[0] == 2
    assert ds.masks[0].mean() > 0.9  # fully masked

    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1))
    tr = NerfTrainer(NerfNetwork(cfg), ds, n_rays=64, n_march_steps=32,
                     batch_size=512, grid_warmup_steps=1,
                     grid_update_cadence=4)
    assert "mask" in tr.data
    state = tr.init(jax.random.PRNGKey(0))
    for _ in range(3):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))


def test_scene_registry():
    from synerfgine_tpu.eval.scenes import resolve_scene, scenes_nerf

    assert "lego" in scenes_nerf and "fox" in scenes_nerf
    e = resolve_scene("lego")
    assert e["dataset_train"] == "transforms_train.json"
    e2 = resolve_scene("/some/path")
    assert e2["data_dir"] == "/some/path"


def test_nerfcapture_writer(tmp_path):
    from synerfgine_tpu.data.nerfcapture import NerfCaptureWriter

    wtr = NerfCaptureWriter(tmp_path / "cap", overwrite=True)
    rng = np.random.default_rng(2)
    for i in range(3):
        wtr.add_frame({
            "image": rng.integers(0, 255, (16, 20, 3), dtype=np.uint8),
            "depth": rng.uniform(0.5, 2.0, (16, 20)).astype(np.float32),
            "transform_matrix": np.eye(4),
            "fl_x": 18.0, "fl_y": 18.0, "cx": 10.0, "cy": 8.0,
        })
    out = wtr.finalize()
    t = json.loads(open(out).read())
    assert len(t["frames"]) == 3
    assert "integer_depth_scale" in t
    assert (tmp_path / "cap" / t["frames"][0]["depth_path"]).exists()


def test_nerfcapture_depth_roundtrip(tmp_path):
    """Decoding the stored uint16 depth with integer_depth_scale must
    return metric depth (reference nerfcapture2nerf.py:192 convention:
    d16 = depth * 65535 / depth_scale)."""
    from PIL import Image

    from synerfgine_tpu.data.nerfcapture import NerfCaptureWriter

    depth = np.array([[0.5, 1.0], [2.5, 9.5]], np.float32)
    wtr = NerfCaptureWriter(tmp_path / "cap", overwrite=True,
                            depth_scale=10.0)
    wtr.add_frame({
        "image": np.zeros((2, 2, 3), np.uint8), "depth": depth,
        "transform_matrix": np.eye(4),
        "fl_x": 2.0, "fl_y": 2.0, "cx": 1.0, "cy": 1.0,
    })
    out = wtr.finalize()
    t = json.loads(open(out).read())
    d16 = np.asarray(Image.open(
        tmp_path / "cap" / t["frames"][0]["depth_path"]))
    decoded = d16.astype(np.float32) * t["integer_depth_scale"]
    np.testing.assert_allclose(decoded, depth, atol=2e-4)


def test_nerfcapture_overwrite_clears_stale(tmp_path):
    from synerfgine_tpu.data.nerfcapture import NerfCaptureWriter

    w1 = NerfCaptureWriter(tmp_path / "cap", overwrite=True)
    for i in range(3):
        w1.add_frame({"image": np.zeros((4, 4, 3), np.uint8),
                      "transform_matrix": np.eye(4),
                      "fl_x": 2.0, "fl_y": 2.0, "cx": 2.0, "cy": 2.0})
    w1.finalize()
    w2 = NerfCaptureWriter(tmp_path / "cap", overwrite=True)
    w2.add_frame({"image": np.zeros((4, 4, 3), np.uint8),
                  "transform_matrix": np.eye(4),
                  "fl_x": 2.0, "fl_y": 2.0, "cx": 2.0, "cy": 2.0})
    w2.finalize()
    pngs = sorted((tmp_path / "cap" / "images").glob("*.png"))
    assert [p.name for p in pngs] == ["0.png"]


def test_record3d_rotate_rotates_pixels(tmp_path):
    """--rotate must rotate the jpgs themselves (reference
    record3d2nerf.py:112 rotates in place), so the emitted w/h match the
    files and cx'/cy' land on the rotated principal point."""
    from PIL import Image

    from synerfgine_tpu.data.record3d import record3d_to_nerf

    scene = tmp_path / "cap"
    (scene / "rgbd").mkdir(parents=True)
    # portrait 32h x 24w with an asymmetric marker at top-left
    img = np.zeros((32, 24, 3), np.uint8)
    img[0:4, 0:4] = 255
    for i in range(3):
        Image.fromarray(img).save(scene / "rgbd" / f"{i}.jpg")
        a = 2 * np.pi * i / 3
    poses = [[0, np.sin(np.pi * i / 3), 0, np.cos(np.pi * i / 3),
              3 * np.sin(2 * np.pi * i / 3), 0.0,
              3 * np.cos(2 * np.pi * i / 3)] for i in range(3)]
    meta = {"poses": poses, "h": 32, "w": 24,
            "K": np.array([[20.0, 0, 0], [0, 21.0, 0],
                           [12.0, 16.0, 1.0]]).T.reshape(-1).tolist()}
    (scene / "metadata").write_text(json.dumps(meta))

    out = record3d_to_nerf(scene, rotate=True)
    t = json.loads(open(out).read())
    rotated = np.asarray(Image.open(scene / "rgbd" / "0.jpg"))
    # landscape now; dims in transforms match the pixel files
    assert rotated.shape[:2] == (24, 32)
    assert t["w"] == 32 and t["h"] == 24
    # PIL rotate(90, expand=1) is counterclockwise: old top-left marker
    # moves to the bottom-left
    assert rotated[-4:, :4].mean() > 200
    assert rotated[:4, -4:].mean() < 50
