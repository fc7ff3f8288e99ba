import numpy as np

from synerfgine_tpu.data.sharpness import sharpness_maps, sharpness_weights


def test_sharpness_detects_texture():
    rng = np.random.default_rng(0)
    img = np.full((1, 64, 64, 3), 0.5, np.float32)
    # noisy (sharp) quadrant
    img[0, :32, :32] += rng.normal(0, 0.2, (32, 32, 3)).astype(np.float32)
    m = sharpness_maps(img, grid=4)
    assert m.shape == (1, 4, 4)
    assert m[0, 0, 0] > m[0, 3, 3] * 5


def test_sharpness_weights_normalized():
    maps = np.array([[[0.0, 1.0], [2.0, 3.0]]], np.float32)
    w = sharpness_weights(maps)
    assert abs(w.mean() - max(w.mean(), 0.1)) < 1.0
    assert w.min() >= 0.1
    assert w[0, 1, 1] > w[0, 0, 1]


def test_sharpness_weighted_training(lego_dir):
    import jax
    import jax.numpy as jnp
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.core.config import (NGPNetworkConfig, HashGridConfig,
                                            MLPConfig)

    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    ds = load_nerf_dataset(lego_dir, max_images=2, downscale=16)
    tr = NerfTrainer(NerfNetwork(cfg), ds, n_rays=64, n_march_steps=32,
                     batch_size=512, use_grid=True, grid_warmup_steps=1,
                     grid_update_cadence=4, sharpness_weighted=True)
    assert "sharpness" in tr.data
    sh = tr.data["sharpness"]
    assert sh.shape[0] == 2 and float(jnp.min(sh)) >= 0.1
    state = tr.init(jax.random.PRNGKey(0))
    for _ in range(3):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))
