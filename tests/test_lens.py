"""Lens distortion models + per-image intrinsics + depth-map loading.

Reference parity targets: common_device.cuh:250-340 (distortion deltas,
iterative undistortion), 403-455 (uv_to_ray lens branch),
nerf_loader.cu:625-630 (depth maps), nerf_loader.cu:695 (per-frame
intrinsics overrides).
"""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synerfgine_tpu.core.lens import (
    Lens, fisheye_delta, iterative_undistort, lens_distort_uv,
    lens_from_transforms, lens_ray_dir, opencv_delta,
)


def test_opencv_undistort_inverse():
    params = jnp.asarray([0.1, -0.05, 0.01, 0.02], jnp.float32)
    u = jnp.linspace(-0.4, 0.4, 9)
    v = jnp.linspace(-0.3, 0.3, 9)
    uu, vv = jnp.meshgrid(u, v)
    du, dv = opencv_delta(params, uu, vv)
    ud, vd = uu + du, vv + dv            # distorted
    ur, vr = iterative_undistort(params, ud, vd, opencv_delta)
    np.testing.assert_allclose(np.asarray(ur), np.asarray(uu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vr), np.asarray(vv), atol=1e-5)


def test_fisheye_undistort_inverse():
    params = jnp.asarray([0.05, -0.02, 0.01, 0.0], jnp.float32)
    u = jnp.linspace(-0.5, 0.5, 7)
    v = jnp.linspace(-0.5, 0.5, 7)
    uu, vv = jnp.meshgrid(u, v)
    du, dv = fisheye_delta(params, uu, vv)
    ur, vr = iterative_undistort(params, uu + du, vv + dv, fisheye_delta)
    np.testing.assert_allclose(np.asarray(ur), np.asarray(uu), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vr), np.asarray(vv), atol=1e-4)


def test_project_raycast_consistency():
    """pos_to_uv-with-lens then uv_to_ray-with-lens must return a ray
    through the original point (the render-with-lens == GT invariant)."""
    lens = Lens("opencv", (0.08, -0.03, 0.005, 0.01))
    res = (640, 480)
    fl = jnp.asarray([500.0, 500.0])
    pp = jnp.asarray([0.52, 0.49])
    pts_cam = jnp.asarray([[0.2, -0.1, 1.5], [-0.4, 0.3, 2.0],
                           [0.0, 0.0, 1.0], [0.5, 0.5, 3.0]], jnp.float32)
    uv = lens_distort_uv(pts_cam, res, fl, pp, lens)
    dirs = lens_ray_dir(uv, res, fl, pp, lens)
    # direction must be parallel to the camera-space point
    d = dirs / dirs[..., 2:3]
    p = pts_cam / pts_cam[..., 2:3]
    np.testing.assert_allclose(np.asarray(d), np.asarray(p), atol=1e-4)


def test_panoramic_dirs_unit():
    uv = jnp.stack(jnp.meshgrid(jnp.linspace(0.05, 0.95, 5),
                                jnp.linspace(0.05, 0.95, 5)), -1).reshape(-1, 2)
    for mode in ("latlong", "equirectangular"):
        d = lens_ray_dir(uv, (64, 32), jnp.asarray([30.0, 30.0]),
                         jnp.asarray([0.5, 0.5]), Lens(mode))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_lens_from_transforms():
    assert lens_from_transforms({}).mode == "perspective"
    l = lens_from_transforms({"k1": 0.1, "k2": 0.0, "p1": 0.0, "p2": 0.0})
    assert l.mode == "opencv" and l.params[0] == pytest.approx(0.1)
    lf = lens_from_transforms({"is_fisheye": True, "k1": 0.1})
    assert lf.mode == "opencv_fisheye"
    assert lens_from_transforms({"camera_model": "latlong"}).mode == "latlong"


def _write_tiny_dataset(tmp_path, n=3, w=16, h=12, per_frame=False,
                        depth=False, extra=None):
    from PIL import Image

    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        name = f"im_{i}.png"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            tmp_path / name)
        fr = {"file_path": name,
              "transform_matrix": np.eye(4).tolist()}
        if per_frame:
            fr["fl_x"] = 20.0 + i
            fr["fl_y"] = 21.0 + i
            fr["cx"] = w / 2 + i * 0.5
            fr["cy"] = h / 2
        if depth:
            dname = f"im_{i}.depth.png"
            d16 = np.full((h, w), 1000 * (i + 1), np.uint16)
            Image.fromarray(d16).save(tmp_path / dname)
            fr["depth_path"] = dname
        frames.append(fr)
    meta = {"fl_x": 20.0, "fl_y": 20.0, "cx": w / 2, "cy": h / 2,
            "aabb_scale": 1, "frames": frames}
    if depth:
        meta["integer_depth_scale"] = 2.0 / 65535.0
    meta.update(extra or {})
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    return tmp_path


def test_loader_per_frame_intrinsics(tmp_path):
    from synerfgine_tpu.data import load_nerf_dataset

    _write_tiny_dataset(tmp_path, per_frame=True)
    ds = load_nerf_dataset(tmp_path)
    assert ds.focals is not None and ds.pps is not None
    np.testing.assert_allclose(ds.focals[:, 0], [20.0, 21.0, 22.0])
    np.testing.assert_allclose(ds.focals[:, 1], [21.0, 22.0, 23.0])
    np.testing.assert_allclose(ds.pps[0], [0.5, 0.5])
    assert ds.pps[1, 0] > 0.5
    # defaults stay the dataset-level values
    np.testing.assert_allclose(ds.focal_length, [20.0, 20.0])


def test_loader_uniform_intrinsics_stay_none(tmp_path):
    from synerfgine_tpu.data import load_nerf_dataset

    _write_tiny_dataset(tmp_path)
    ds = load_nerf_dataset(tmp_path)
    assert ds.focals is None and ds.pps is None


def test_loader_depth_files(tmp_path):
    from synerfgine_tpu.data import load_nerf_dataset

    _write_tiny_dataset(tmp_path, depth=True)
    ds = load_nerf_dataset(tmp_path)
    assert ds.depths is not None and ds.depths.shape == (3, 12, 16)
    # d16=1000*(i+1), scale 2/65535 -> metric
    np.testing.assert_allclose(
        ds.depths[:, 0, 0], [1000 * 2 / 65535, 2000 * 2 / 65535,
                             3000 * 2 / 65535], rtol=1e-6)


def test_loader_lens_parsed(tmp_path):
    from synerfgine_tpu.data import load_nerf_dataset

    _write_tiny_dataset(tmp_path, extra={"k1": 0.05, "k2": -0.01,
                                         "p1": 0.001, "p2": 0.0})
    ds = load_nerf_dataset(tmp_path)
    assert ds.lens.mode == "opencv"
    np.testing.assert_allclose(ds.lens.params, (0.05, -0.01, 0.001, 0.0))


def test_loader_mixed_resolution_unified(tmp_path):
    """Frames at a different resolution are resized to frame 0's with
    intrinsics scaled to match (static-shape tensor policy)."""
    from PIL import Image

    from synerfgine_tpu.data import load_nerf_dataset

    _write_tiny_dataset(tmp_path, n=2)
    # overwrite frame 1 with a half-size image
    Image.fromarray(np.zeros((6, 8, 3), np.uint8)).save(tmp_path / "im_1.png")
    ds = load_nerf_dataset(tmp_path)
    assert ds.images.shape == (2, 12, 16, 4)
    assert ds.focals is not None
    # frame 1's focal got scaled by 2x to preserve its FOV
    np.testing.assert_allclose(ds.focals[1], [40.0, 40.0])
    np.testing.assert_allclose(ds.focals[0], [20.0, 20.0])


def test_trainer_rays_use_lens_and_per_image_focals(tmp_path):
    """Distorted rays differ from pinhole rays; per-image focal overrides
    change the per-ray directions."""
    import dataclasses

    from synerfgine_tpu.core.config import (HashGridConfig, MLPConfig,
                                            NGPNetworkConfig)
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    _write_tiny_dataset(tmp_path, per_frame=True)
    ds = load_nerf_dataset(tmp_path)
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=2, n_features_per_level=2,
                                log2_hashmap_size=8, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1))

    def rays_of(d):
        tr = NerfTrainer(NerfNetwork(cfg), d, n_rays=8, batch_size=64,
                         use_grid=False, n_steps_per_ray=4)
        img_idx = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1])
        uv = jnp.tile(jnp.asarray([[0.8, 0.2]]), (8, 1))
        return tr._rays_for(tr.data, img_idx, uv)

    r_plain = rays_of(dataclasses.replace(ds, focals=None, pps=None))
    r_per = rays_of(ds)
    # same uv, different per-image focal -> different directions
    assert not np.allclose(np.asarray(r_plain.d), np.asarray(r_per.d))

    ds_lens = dataclasses.replace(
        ds, focals=None, pps=None,
        lens=Lens("opencv", (0.1, -0.02, 0.0, 0.0)))
    r_lens = rays_of(ds_lens)
    assert not np.allclose(np.asarray(r_plain.d), np.asarray(r_lens.d),
                           atol=1e-5)


def test_rolling_shutter_xforms(tmp_path):
    """transform_matrix_start/end + rolling_shutter load and produce
    per-ray poses interpolated along scanlines
    (common_device.cuh:363-371, nerf_loader.cu:204-215)."""
    import dataclasses

    from synerfgine_tpu.core.camera import rolling_shutter_xform
    from synerfgine_tpu.core import se3
    from synerfgine_tpu.data import load_nerf_dataset
    from PIL import Image

    # dataset whose frames move between start and end
    rng = np.random.default_rng(0)
    frames = []
    for i in range(2):
        name = f"im_{i}.png"
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(tmp_path / name)
        start = np.eye(4)
        end = np.eye(4)
        end[0, 3] = 1.0   # camera slides +x during exposure
        frames.append({"file_path": name,
                       "transform_matrix_start": start.tolist(),
                       "transform_matrix_end": end.tolist()})
    meta = {"fl_x": 8.0, "fl_y": 8.0, "cx": 4, "cy": 4, "aabb_scale": 1,
            "rolling_shutter": [0.0, 0.0, 1.0, 0.0], "frames": frames}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    ds = load_nerf_dataset(tmp_path)
    assert ds.xforms_end is not None
    np.testing.assert_allclose(ds.rolling_shutter, [0, 0, 1, 0])
    # poses differ between start and end arrays
    assert not np.allclose(ds.xforms, ds.xforms_end)

    # top scanline (v=0) -> start pose; bottom (v=1) -> end pose
    start = jnp.asarray(ds.xforms[:1])
    end = jnp.asarray(ds.xforms_end[:1])
    uv_top = jnp.asarray([[0.5, 0.0]])
    uv_bot = jnp.asarray([[0.5, 1.0]])
    m_top = rolling_shutter_xform(start, end, uv_top, ds.rolling_shutter, 0.0)
    m_bot = rolling_shutter_xform(start, end, uv_bot, ds.rolling_shutter, 0.0)
    np.testing.assert_allclose(np.asarray(m_top[0]), np.asarray(start[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_bot[0]), np.asarray(end[0]),
                               atol=1e-6)
    # halfway scanline: halfway position
    m_mid = rolling_shutter_xform(start, end, jnp.asarray([[0.5, 0.5]]),
                                  ds.rolling_shutter, 0.0)
    np.testing.assert_allclose(np.asarray(m_mid[0, :, 3]),
                               0.5 * (np.asarray(start[0, :, 3])
                                      + np.asarray(end[0, :, 3])), atol=1e-6)

    # rotation slerp: 90-degree z rotation at t=0.5 == 45 degrees
    rot_end = np.eye(4)
    rot_end[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]])
    s = jnp.asarray(np.eye(4)[None, :3, :4], jnp.float32)
    e = jnp.asarray(rot_end[None, :3, :4], jnp.float32)
    m = rolling_shutter_xform(s, e, jnp.asarray([[0.5, 0.5]]),
                              jnp.asarray([0, 0, 1, 0.0]), 0.0)
    c = np.cos(np.pi / 4)
    np.testing.assert_allclose(
        np.asarray(m[0, :2, :2]), [[c, -c], [c, c]], atol=1e-5)


def test_trainer_uses_rolling_shutter(tmp_path):
    import dataclasses

    import jax

    from synerfgine_tpu.core.config import (HashGridConfig, MLPConfig,
                                            NGPNetworkConfig)
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer
    from PIL import Image

    rng = np.random.default_rng(1)
    frames = []
    for i in range(2):
        name = f"im_{i}.png"
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(tmp_path / name)
        end = np.eye(4)
        end[1, 3] = 0.5
        frames.append({"file_path": name,
                       "transform_matrix_start": np.eye(4).tolist(),
                       "transform_matrix_end": end.tolist()})
    meta = {"fl_x": 8.0, "fl_y": 8.0, "cx": 4, "cy": 4, "aabb_scale": 1,
            "rolling_shutter": [0.0, 0.0, 1.0, 0.0], "frames": frames}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    ds = load_nerf_dataset(tmp_path)
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=2, n_features_per_level=2,
                                log2_hashmap_size=8, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1))
    tr = NerfTrainer(NerfNetwork(cfg), ds, n_rays=16, batch_size=128,
                     use_grid=False, n_steps_per_ray=4)
    # rays at the bottom scanline originate from the end pose
    img_idx = jnp.zeros(4, jnp.int32)
    uv = jnp.asarray([[0.5, 0.0], [0.5, 0.33], [0.5, 0.66], [0.5, 1.0]])
    rays = tr._rays_for(tr.data, img_idx, uv)
    o = np.asarray(rays.o)
    assert not np.allclose(o[0], o[3])
    # training steps run finite
    state = tr.init(jax.random.PRNGKey(0))
    state, loss = tr.step(state)
    assert np.isfinite(float(loss))
