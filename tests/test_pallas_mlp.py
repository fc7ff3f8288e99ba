"""Pallas fused-MLP kernel vs the jnp reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.nn.mlp import MLP
from synerfgine_tpu.nn.pallas_mlp import fused_mlp_apply, TILE


def test_fused_mlp_matches_reference():
    mlp = MLP(32, 16, n_neurons=64, n_hidden_layers=2)
    params = mlp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (TILE * 2, 32))
    ref = mlp(params, x, compute_dtype=jnp.float32)
    got = fused_mlp_apply(mlp, params, x, compute_dtype=jnp.float32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_mlp_pads_ragged_batch():
    mlp = MLP(16, 4, n_neurons=32, n_hidden_layers=1)
    params = mlp.init(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (TILE + 7, 16))
    ref = mlp(params, x, compute_dtype=jnp.float32)
    got = fused_mlp_apply(mlp, params, x, compute_dtype=jnp.float32,
                          interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_mlp_gradients_match_reference():
    """Custom-VJP backward (recompute + grid-accumulated dW) vs autodiff
    of the jnp reference."""
    mlp = MLP(32, 16, n_neurons=64, n_hidden_layers=2)
    params = mlp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (TILE * 3, 32))
    t = jax.random.normal(jax.random.PRNGKey(2), (TILE * 3, 16))

    def loss_ref(p, x):
        return jnp.mean((mlp(p, x, compute_dtype=jnp.float32) - t) ** 2)

    def loss_pallas(p, x):
        y = fused_mlp_apply(mlp, p, x, compute_dtype=jnp.float32,
                            interpret=True)
        return jnp.mean((y - t) ** 2)

    (gw_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    (gw_pal, gx_pal) = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    for a, b in zip(gw_ref, gw_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-3)


def test_nerf_network_with_pallas_mlp_trains(lego_dir):
    """End-to-end: NerfNetwork(use_pallas_mlp=True) trains (interpret
    mode on CPU)."""
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
    tr = NerfTrainer(NerfNetwork(cfg, use_pallas_mlp=True), ds, n_rays=64,
                     n_march_steps=32, batch_size=512, use_grid=True,
                     grid_warmup_steps=1, grid_update_cadence=4)
    state = tr.init(jax.random.PRNGKey(0))
    for _ in range(3):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))
