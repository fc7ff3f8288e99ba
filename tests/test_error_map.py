import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.train.error_map import (
    init_error_map, deposit, sample_uv, ERROR_MAP_RES,
)


def test_deposit_and_decay():
    em = init_error_map(2)
    img = jnp.array([0, 0, 1])
    uv = jnp.array([[0.1, 0.1], [0.1, 0.1], [0.9, 0.9]])
    loss = jnp.array([1.0, 2.0, 3.0])
    em2 = deposit(em, img, uv, loss, decay=0.5)
    res = ERROR_MAP_RES
    x = int(0.1 * res)
    assert np.isclose(float(em2[0, x, x]), 0.5 + 3.0)  # decayed + 1 + 2
    assert np.isclose(float(em2[1, int(0.9 * res), int(0.9 * res)]), 0.5 + 3.0)


def test_sampling_concentrates_on_error():
    em = init_error_map(1) * 1e-6
    # hot spot at cell (8, 24): x=8, y=24
    em = em.at[0, 24, 8].set(100.0)
    img = jnp.zeros(4096, jnp.int32)
    uv = sample_uv(jax.random.PRNGKey(0), em, img)
    res = ERROR_MAP_RES
    in_cell = (
        (uv[:, 0] >= 8 / res) & (uv[:, 0] < 9 / res)
        & (uv[:, 1] >= 24 / res) & (uv[:, 1] < 25 / res)
    )
    frac = float(jnp.mean(in_cell))
    # ~half the batch is importance-sampled, nearly all of it in the cell
    assert 0.35 < frac < 0.65, frac
    # uniform half still covers the rest of the image
    assert float(jnp.mean(uv[:, 0] < 0.25)) > 0.05


def test_trainer_with_error_map(lego_dir):
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.core.config import (
        NGPNetworkConfig, HashGridConfig, MLPConfig,
    )

    ds = load_nerf_dataset(lego_dir, max_images=2, downscale=16)
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    tr = NerfTrainer(NerfNetwork(cfg), ds, n_rays=64, n_march_steps=32,
                     batch_size=512, use_grid=True, grid_warmup_steps=1,
                     grid_update_cadence=4, use_error_map=True)
    state = tr.init(jax.random.PRNGKey(0))
    assert state.error_map is not None
    em0 = np.asarray(state.error_map)
    for _ in range(4):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(state.error_map), em0)
