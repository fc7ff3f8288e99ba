"""End-to-end hybrid engine frame test (tiny NeRF + armadillo-style scene)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synerfgine_tpu.hybrid.engine import Engine
from synerfgine_tpu.hybrid.scene import (
    Scene, Material, Light, VirtualObject, RenderSettings,
)
from synerfgine_tpu.grid.occupancy import OccupancyGrid
from synerfgine_tpu.nn.nerf_network import NerfNetwork
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig
from synerfgine_tpu.render.camera_path import SngCamPath, SngKeyframe


def _tiny_setup():
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    net = NerfNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    grid = OccupancyGrid(1)
    gstate = grid.init()
    # occupy a central ball so the NeRF pass has something to hit
    density = gstate.density
    c = grid.cell_centers(0).reshape(128, 128, 128, 3)
    ball = jnp.linalg.norm(c - 0.5, axis=-1) < 0.2
    density = density.at[0].set(jnp.where(ball, 1.0, 0.0))
    gstate = grid.finalize(gstate._replace(density=density))

    tri = np.asarray([[[0.3, 0.2, 0.3], [0.7, 0.2, 0.3], [0.5, 0.2, 0.7]]], np.float32)
    scene = Scene(
        materials=[Material(0, kd=[0.9, 0.2, 0.2], rg=0.2)],
        lights=[Light(0, [0.5, 2.0, 0.5], intensity=1.0, size=0.01)],
        objects=[VirtualObject(0, tri, np.zeros(3, np.float32),
                               np.eye(3, dtype=np.float32), 1.0, 0)],
        settings=RenderSettings(light_samples=1, shadow_samples=1,
                                path_trace_depth=1, smooth_kernel_size=2,
                                res_factor=8),
        cam_path=SngCamPath(
            [SngKeyframe(np.array([0.5, 0.5, -1.0], np.float32),
                         np.array([0.5, 0.5, 0.5], np.float32)),
             SngKeyframe(np.array([0.6, 0.6, -1.0], np.float32),
                         np.array([0.5, 0.5, 0.5], np.float32))],
            fps=4, total_time_ms=1000, end_on_loop=True),
    )
    return net, params, grid, gstate, scene


def test_engine_frame_produces_image(tmp_path):
    net, params, grid, gstate, scene = _tiny_setup()
    scene.record = True
    scene.output_folder = str(tmp_path / "frames")
    eng = Engine(net, params, grid, gstate, scene, width=64, height=48)
    out = eng.frame()
    assert out["rgb"].shape == (48, 64, 3)
    assert np.isfinite(out["rgb"]).all()
    assert out["rgb"].min() >= 0.0 and out["rgb"].max() <= 1.0
    # something was drawn (NeRF ball and/or triangle)
    assert out["rgb"].std() > 1e-4
    import pathlib

    assert (pathlib.Path(scene.output_folder) / "output-001.png").exists()
    assert "nerf" in eng.timings and "syn" in eng.timings


def test_engine_campath_finishes():
    net, params, grid, gstate, scene = _tiny_setup()
    eng = Engine(net, params, grid, gstate, scene, width=32, height=24)
    n = 0
    while not eng.finished() and n < 20:
        eng.frame()
        n += 1
    assert n == scene.cam_path.n_frames  # 4 fps x 1 s


def test_engine_temporal_accumulation_static_camera():
    net, params, grid, gstate, scene = _tiny_setup()
    scene.cam_path = None
    scene.default_view = np.array([0.0, 0.0, -1.0], np.float32)
    scene.default_at = np.array([0.5, 0.5, 0.5], np.float32)
    eng = Engine(net, params, grid, gstate, scene, width=32, height=24)
    a = eng.frame()["rgb"]
    b = eng.frame()["rgb"]  # same camera: accumulated
    assert eng._acc_cam is not None
    assert np.isfinite(b).all()


@pytest.mark.fast
def test_default_camera_frames_shipped_scene():
    """Camera parity: scene 'view' is a view DIRECTION and 'zoom' the
    eye distance (set_view_dir/set_look_at/set_scale,
    testbed.cu:405-425), fov fixed at 50.625 deg on the y axis
    (testbed.cu:471,480). Under these rules the armadillo is visible
    from its scene's default camera; the round-4 eye-at-distance-1 +
    focal-scaled-by-zoom form framed it fully out of view."""
    import pathlib

    from synerfgine_tpu.hybrid.scene import load_scene_json

    scene_json = pathlib.Path(
        "/root/reference/scripts/virtual_desc/armadillo.json")
    if not scene_json.exists():
        pytest.skip("reference scene not available")
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=2, n_features_per_level=2,
                                log2_hashmap_size=8, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    net = NerfNetwork(cfg)
    grid = OccupancyGrid(1)
    scene = load_scene_json(str(scene_json))
    scene.settings.show_nerf = False
    scene.settings.shadow_on_nerf = False
    eng = Engine(net, net.init(jax.random.PRNGKey(0)), grid, grid.init(),
                 scene, width=80, height=46)
    out = eng.frame()
    hit_frac = float(np.asarray(out["syn"]["hit"]).mean())
    assert hit_frac > 0.02, f"armadillo out of frame (hit {hit_frac})"
