"""Full-cell row layout (lattice hash mode): cell_encode must equal the
plain 8-corner encoding under the same (lattice) hash — it is a pure
gather-layout transformation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synerfgine_tpu.nn.hash_encoding import (
    HashEncoding,
    exact_encode,
    stochastic_encode,
)


@pytest.fixture(scope="module", params=[2, 3])
def enc(request):
    return HashEncoding(n_levels=4, n_features_per_level=2,
                        log2_hashmap_size=9, base_resolution=4,
                        per_level_scale=2.0, n_dims=request.param,
                        hash_mode="lattice")


def _data(enc, n=200):
    key = jax.random.PRNGKey(7)
    table = enc.init(key, scale=0.5)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (n, enc.n_dims))
    return table, x


def test_cell_encode_matches_plain(enc):
    table, x = _data(enc)
    ct = enc.make_cell_table(table)
    assert ct.shape == (enc.n_params, (1 << enc.n_dims) * enc.F)
    np.testing.assert_allclose(np.asarray(enc.cell_encode(ct, x)),
                               np.asarray(enc(table, x)), atol=1e-5)


def test_cell_encode_boundaries(enc):
    """x exactly 0 and 1 (base clamp + weight saturation)."""
    table, _ = _data(enc)
    x = jnp.stack([jnp.zeros(enc.n_dims), jnp.ones(enc.n_dims),
                   jnp.full(enc.n_dims, 1.0 - 1e-7)])
    ct = enc.make_cell_table(table)
    np.testing.assert_allclose(np.asarray(enc.cell_encode(ct, x)),
                               np.asarray(enc(table, x)), atol=1e-5)


def test_paired_table_dispatch_upgrades_to_cell(enc):
    """make_paired_table under lattice returns the cell table and
    paired_encode dispatches to cell_encode — render/grid call sites
    get the layout transparently."""
    table, x = _data(enc)
    pt = enc.make_paired_table(table)
    assert pt.shape[1] == (1 << enc.n_dims) * enc.F
    np.testing.assert_allclose(np.asarray(enc.paired_encode(pt, x)),
                               np.asarray(enc(table, x)), atol=1e-5)


def test_train_forwards_match_under_lattice(enc):
    table, x = _data(enc)
    u = jax.random.uniform(jax.random.PRNGKey(3), (enc.n_levels, x.shape[0]))
    np.testing.assert_allclose(
        np.asarray(stochastic_encode(enc, table, x, u)),
        np.asarray(enc(table, x)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(exact_encode(enc, table, x, u)),
        np.asarray(enc(table, x)), atol=1e-5)


def test_exact_backward_matches_oracle_under_lattice(enc):
    table, x = _data(enc, 64)
    u = jnp.zeros((enc.n_levels, 64))
    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (64, enc.n_output_dims))
    g_exact = jax.grad(
        lambda t: jnp.sum(exact_encode(enc, t, x, u) * cot))(table)
    g_oracle = jax.grad(lambda t: jnp.sum(enc(t, x) * cot))(table)
    np.testing.assert_allclose(np.asarray(g_exact), np.asarray(g_oracle),
                               atol=1e-5, rtol=1e-5)


def test_lattice_corner_offsets_are_fixed():
    """The property the layout relies on: hash(base + corner) ==
    (hash(base) + fixed_offset) mod T for hashed levels."""
    enc = HashEncoding(n_levels=1, n_features_per_level=2,
                       log2_hashmap_size=7, base_resolution=64,
                       per_level_scale=1.0, hash_mode="lattice")
    assert not enc.level_is_dense[0]
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3))
    idx, _ = enc._level_indices(x, 0)
    idx = np.asarray(idx)
    strides = enc._cell_strides(0)
    T = enc.hashmap_size
    corners = enc._corners
    # interior samples only (boundary clamps break pure offsets)
    pos = np.asarray(x) * enc.scales[0] + 0.5
    interior = (np.floor(pos) < enc.resolutions[0] - 1).all(1)
    for k in range(1, 8):
        o = sum(int(c) * s for c, s in zip(corners[k], strides)) % T
        np.testing.assert_array_equal(
            idx[interior, k], (idx[interior, 0] + o) % T)
