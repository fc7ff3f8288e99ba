import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.data import load_nerf_dataset
from synerfgine_tpu.train.nerf_trainer import NerfTrainer
from synerfgine_tpu.nn.nerf_network import NerfNetwork
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig


def _cfg():
    return NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )


def test_per_image_latents_train(lego_dir):
    ds = load_nerf_dataset(lego_dir, max_images=3, downscale=16)
    net = NerfNetwork(_cfg(), n_extra_dims=4)
    tr = NerfTrainer(net, ds, n_rays=64, n_march_steps=32, batch_size=512,
                     use_grid=True, grid_warmup_steps=1, grid_update_cadence=4,
                     n_extra_dims=4)
    state = tr.init(jax.random.PRNGKey(0))
    assert state.params.latents.shape == (3, 4)
    for _ in range(5):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))
    assert float(jnp.max(jnp.abs(state.params.latents))) > 0  # trained


def test_latents_dim_mismatch_raises(lego_dir):
    ds = load_nerf_dataset(lego_dir, max_images=2, downscale=16)
    net = NerfNetwork(_cfg(), n_extra_dims=0)
    import pytest

    with pytest.raises(ValueError):
        NerfTrainer(net, ds, n_extra_dims=4)


def test_depth_supervision(lego_dir):
    ds = load_nerf_dataset(lego_dir, max_images=2, downscale=16)
    # synthetic depth maps: constant depth 1.2 where alpha > 0
    depths = np.where(ds.images[..., 3] > 0, 1.2, 0.0).astype(np.float32)
    ds = dataclasses.replace(ds)
    ds.depths = depths
    net = NerfNetwork(_cfg())
    tr = NerfTrainer(net, ds, n_rays=64, n_march_steps=32, batch_size=512,
                     use_grid=True, grid_warmup_steps=1, grid_update_cadence=4,
                     depth_supervision_lambda=0.5)
    assert "depths" in tr.data
    state = tr.init(jax.random.PRNGKey(0))
    for _ in range(5):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))
