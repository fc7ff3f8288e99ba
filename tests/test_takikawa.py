import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.nn.takikawa import TakikawaEncoding, _voxelize_surface


def _quad(z=0.5):
    return np.asarray([
        [[0.2, 0.2, z], [0.8, 0.2, z], [0.8, 0.8, z]],
        [[0.2, 0.2, z], [0.8, 0.8, z], [0.2, 0.8, z]],
    ], np.float32)


def test_voxelize_covers_surface():
    occ = _voxelize_surface(_quad(), 16)
    zc = int(0.5 * 16)
    # the z=0.5 plane cells around the quad center are occupied
    assert occ[8, 8, zc] or occ[8, 8, zc - 1]
    # far-away corner is empty
    assert not occ[0, 0, 15]
    assert 0.001 < occ.mean() < 0.2


def test_takikawa_on_surface_vs_far():
    enc = TakikawaEncoding(_quad(), start_level=2, n_levels=3,
                           n_features_per_level=4)
    assert enc.n_params > 0
    table = enc.init(jax.random.PRNGKey(0), scale=0.5)
    on_surface = jnp.array([[0.5, 0.5, 0.5]])
    far = jnp.array([[0.05, 0.05, 0.95]])
    f_on = enc(table, on_surface)
    f_far = enc(table, far)
    assert f_on.shape == (1, 4)
    assert float(jnp.abs(f_on).sum()) > 0
    assert float(jnp.abs(f_far).sum()) == 0.0  # outside the octree


def test_takikawa_gradients_reach_table():
    enc = TakikawaEncoding(_quad(), start_level=2, n_levels=2)
    table = enc.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(0).uniform(0.3, 0.7, (16, 3)),
                    jnp.float32).at[:, 2].set(0.5)
    g = jax.grad(lambda t: jnp.sum(enc(t, x) ** 2))(table)
    assert float(jnp.sum(jnp.abs(g))) > 0
