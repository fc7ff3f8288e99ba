"""The stochastic-corner hash backward must be an unbiased estimator of
the exact gradient (see nn/hash_encoding.py rationale)."""
import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.nn.hash_encoding import HashEncoding, stochastic_encode


def test_stochastic_grad_unbiased():
    enc = HashEncoding(n_levels=2, n_features_per_level=2,
                       log2_hashmap_size=8, base_resolution=4,
                       per_level_scale=2.0)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (enc.n_params, enc.F)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    g_out = jax.random.normal(jax.random.PRNGKey(2),
                              (32, enc.n_output_dims))

    def loss_exact(t):
        return jnp.sum(enc(t, x) * g_out)

    exact = jax.grad(loss_exact)(table)

    def loss_stoch(t, u):
        return jnp.sum(stochastic_encode(enc, t, x, u) * g_out)

    grad_fn = jax.jit(jax.grad(loss_stoch))
    n_draws = 600
    keys = jax.random.split(jax.random.PRNGKey(3), n_draws)
    acc = jnp.zeros_like(table)
    for k in keys:
        u = jax.random.uniform(k, (enc.n_levels, 32))
        acc = acc + grad_fn(table, u)
    mean_grad = acc / n_draws

    # compare where the exact gradient is nonzero
    mask = np.abs(np.asarray(exact)) > 1e-6
    e = np.asarray(exact)[mask]
    m = np.asarray(mean_grad)[mask]
    # unbiasedness: correlation ~ 1 and scale ~ 1 within MC error
    corr = np.corrcoef(e, m)[0, 1]
    scale = (m @ e) / (e @ e)
    assert corr > 0.97, corr
    assert 0.9 < scale < 1.1, scale


def test_stochastic_forward_exact():
    """The forward pass is the exact trilinear interpolation."""
    enc = HashEncoding(n_levels=3, n_features_per_level=2,
                       log2_hashmap_size=10, base_resolution=4,
                       per_level_scale=2.0)
    table = jax.random.normal(jax.random.PRNGKey(0), (enc.n_params, enc.F))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    u = jax.random.uniform(jax.random.PRNGKey(2), (3, 64))
    np.testing.assert_allclose(
        np.asarray(stochastic_encode(enc, table, x, u)),
        np.asarray(enc(table, x)), atol=1e-6)


def test_exact_encode_matches_autodiff_oracle():
    """exact_encode's chunked all-corner backward == jax.grad of the
    plain encoding (the autodiff oracle), both for the table gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synerfgine_tpu.nn.hash_encoding import HashEncoding, exact_encode

    enc = HashEncoding(n_levels=3, n_features_per_level=2,
                       log2_hashmap_size=8, base_resolution=4,
                       per_level_scale=1.7)
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    table = enc.init(k1, scale=0.5)
    x = jax.random.uniform(k2, (64, 3))
    u = jax.random.uniform(k3, (enc.n_levels, 64))
    cot = jax.random.normal(jax.random.fold_in(key, 9),
                            (64, enc.n_output_dims))

    def loss_exact(t):
        return jnp.sum(exact_encode(enc, t, x, u) * cot)

    def loss_oracle(t):
        return jnp.sum(enc(t, x) * cot)

    g_exact = jax.grad(loss_exact)(table)
    g_oracle = jax.grad(loss_oracle)(table)
    np.testing.assert_allclose(np.asarray(g_exact), np.asarray(g_oracle),
                               atol=1e-5, rtol=1e-5)


def test_exact_encode_forward_matches_plain():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synerfgine_tpu.nn.hash_encoding import HashEncoding, exact_encode

    enc = HashEncoding(n_levels=3, n_features_per_level=2,
                       log2_hashmap_size=8, base_resolution=4,
                       per_level_scale=1.7)
    table = enc.init(jax.random.PRNGKey(0), scale=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    u = jnp.zeros((enc.n_levels, 32))
    np.testing.assert_allclose(
        np.asarray(exact_encode(enc, table, x, u)),
        np.asarray(enc(table, x)), atol=1e-5)


def test_lattice_exact_bwd_matches_autodiff_oracle():
    """hash_mode=lattice exact backward (cell-row scatter + static roll
    reduce) == jax.grad through the actual lattice forward
    (make_cell_table + cell_encode), including boundary cells."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synerfgine_tpu.nn.hash_encoding import HashEncoding, exact_encode

    enc = HashEncoding(n_levels=4, n_features_per_level=2,
                       log2_hashmap_size=8, base_resolution=4,
                       per_level_scale=1.7, hash_mode="lattice")
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    table = enc.init(k1, scale=0.5)
    # include exact-boundary positions (0 and 1) to pin clamp semantics
    x = jnp.concatenate([
        jax.random.uniform(k2, (48, 3)),
        jnp.zeros((4, 3)), jnp.ones((4, 3)),
    ])
    u = jax.random.uniform(k3, (enc.n_levels, x.shape[0]))
    cot = jax.random.normal(jax.random.fold_in(key, 9),
                            (x.shape[0], enc.n_output_dims))

    def loss_exact(t):
        return jnp.sum(exact_encode(enc, t, x, u) * cot)

    def loss_oracle(t):
        return jnp.sum(enc.cell_encode(enc.make_cell_table(t), x) * cot)

    g_exact = jax.grad(loss_exact)(table)
    g_oracle = jax.grad(loss_oracle)(table)
    np.testing.assert_allclose(np.asarray(g_exact), np.asarray(g_oracle),
                               atol=1e-5, rtol=1e-5)
