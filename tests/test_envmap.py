import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.nn.envmap import (
    init_envmap, sample_envmap, envmap_background,
    init_distortion, apply_distortion,
)


def test_envmap_sample_poles_and_equator():
    env = init_envmap(8, 16).at[:, :, 3].set(10.0)  # ~opaque (sigmoid(7))
    env = env.at[0, :, 0].set(5.0)     # top row red (theta ~ 0 => +y)
    up = jnp.array([[0.0, 1.0, 0.0]])
    down = jnp.array([[0.0, -1.0, 0.0]])
    e_up = sample_envmap(env, up)
    e_down = sample_envmap(env, down)
    assert float(e_up[0, 0]) > float(e_down[0, 0])
    assert float(e_up[0, 3]) > 0.99


def test_envmap_background_composite():
    # zero-init: rgb 0, alpha sigmoid(-3) ~ 0.047 (near-transparent by
    # design so gradients stay alive) -> bg scaled by 1-alpha
    env = init_envmap(4, 8)
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    bg = jnp.array([[0.25, 0.5, 0.75]])
    out = envmap_background(env, dirs, bg)
    a = 1.0 / (1.0 + np.exp(3.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(bg) * (1 - a),
                               atol=1e-5)


def test_envmap_gradients_flow():
    env = init_envmap(8, 16)
    dirs = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    bg = jnp.zeros((64, 3))

    def loss(e):
        return jnp.sum(envmap_background(e, dirs, bg) ** 2) + jnp.sum(
            envmap_background(e, dirs, bg))

    g = jax.grad(loss)(env)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_distortion_identity_and_offset():
    grid = init_distortion(8)
    uv = jnp.array([[0.3, 0.6], [0.9, 0.1]])
    np.testing.assert_allclose(np.asarray(apply_distortion(grid, uv)),
                               np.asarray(uv), atol=1e-6)
    grid = grid + 0.01
    out = apply_distortion(grid, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(uv) + 0.01, atol=1e-5)


def test_trainer_with_envmap_and_distortion(lego_dir):
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
                     grid_update_cadence=4, train_envmap=True,
                     train_distortion=True)
    state = tr.init(jax.random.PRNGKey(0))
    assert state.params.envmap is not None
    assert state.params.distortion is not None
    for _ in range(5):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))
    # envmap received gradient updates (random bg leaks through T)
    assert float(jnp.max(jnp.abs(state.params.envmap))) > 0
