"""pyngp-parity facade tests across all four modes."""
import numpy as np
import pytest

from synerfgine_tpu.testbed import Testbed
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig


TINY = NGPNetworkConfig(
    encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                            log2_hashmap_size=10, base_resolution=4,
                            per_level_scale=2.0),
    network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
)


def _tiny_testbed(mode):
    tb = Testbed(mode)
    tb._config_src = None
    tb._network_config = lambda *a, **k: TINY
    return tb


def test_testbed_rejects_unknown_mode():
    with pytest.raises(ValueError):
        Testbed("dlss")


def test_testbed_nerf_flow(lego_dir, tmp_path):
    tb = _tiny_testbed("nerf")
    tb.load_training_data(str(lego_dir), max_images=2, downscale=16)
    # make the trainer cheap for CI
    tb.trainer.n_rays = 64
    tb.trainer.n_march_steps = 64
    tb.trainer.batch_size = 1024
    tb.trainer.grid_warmup_steps = 2
    loss = tb.train(6)
    assert np.isfinite(loss)
    assert tb.training_step == 6
    img = tb.render(32, 24, camera=tb.training_view_camera(0))
    assert img.shape == (24, 32, 3)
    p = str(tmp_path / "tb.sng")
    tb.save_snapshot(p, include_optimizer=True)
    tb2 = _tiny_testbed("nerf")
    tb2.load_training_data(str(lego_dir), max_images=2, downscale=16)
    tb2.load_snapshot(p)
    assert tb2.training_step == 6
    verts, faces, colors = tb.compute_marching_cubes_mesh(resolution=24,
                                                          threshold=1.0)
    assert verts.ndim == 2  # may be empty for an untrained net


def test_testbed_image_flow(albert_exr):
    tb = _tiny_testbed("image")
    tb.load_training_data(str(albert_exr))
    tb.trainer.batch_size = 1024
    tb.train(10)
    mse = tb.compute_image_mse()
    assert np.isfinite(mse)
    img = tb.render(16, 16)
    assert img.shape == (16, 16, 3)


def test_testbed_sdf_flow():
    tb = _tiny_testbed("sdf")
    tb.load_training_data("/root/reference/data/sdf/armadillo.obj")
    tb.trainer.batch_size = 1024
    tb.train(5)
    assert np.isfinite(tb.loss)
    iou = tb.calculate_iou(resolution=16)
    assert 0.0 <= iou <= 1.0


def test_testbed_volume_flow(tmp_path):
    vol = np.random.default_rng(0).uniform(0, 2, (16, 16, 16)).astype(np.float32)
    p = str(tmp_path / "vol.npy")
    np.save(p, vol)
    tb = _tiny_testbed("volume")
    tb.load_training_data(p)
    tb.trainer.batch_size = 1024
    tb.train(5)
    assert np.isfinite(tb.loss)
    img = tb.render(16, 16)
    assert img.shape == (16, 16, 3)
