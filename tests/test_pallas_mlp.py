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
