"""Quad-row layout (quad hash mode: additive x+y, scrambled z):
quad_encode must equal the plain 8-corner encoding under the same hash —
a pure gather-layout transformation (two face rows per cell instead of
eight corner gathers). Also pins the properties the layout and its fog
safety rely on: fixed face offsets, and NON-additivity in z."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synerfgine_tpu.nn.hash_encoding import (
    _QUAD_RY,
    HashEncoding,
    _scramble_z,
    exact_encode,
    stochastic_encode,
)


@pytest.fixture(scope="module")
def enc():
    return HashEncoding(n_levels=4, n_features_per_level=2,
                        log2_hashmap_size=9, base_resolution=4,
                        per_level_scale=2.0, n_dims=3, hash_mode="quad")


def _data(enc, n=200):
    key = jax.random.PRNGKey(7)
    table = enc.init(key, scale=0.5)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (n, enc.n_dims))
    return table, x


def test_quad_encode_matches_plain(enc):
    table, x = _data(enc)
    qt = enc.make_quad_table(table)
    assert qt.shape == (enc.n_params, 4 * enc.F)
    np.testing.assert_allclose(np.asarray(enc.quad_encode(qt, x)),
                               np.asarray(enc(table, x)), atol=1e-5)


def test_quad_encode_boundaries(enc):
    table, _ = _data(enc)
    x = jnp.stack([jnp.zeros(3), jnp.ones(3), jnp.full(3, 1.0 - 1e-7),
                   jnp.array([0.0, 1.0, 0.5])])
    qt = enc.make_quad_table(table)
    np.testing.assert_allclose(np.asarray(enc.quad_encode(qt, x)),
                               np.asarray(enc(table, x)), atol=1e-5)


def test_paired_table_dispatch_upgrades_to_quad(enc):
    table, x = _data(enc)
    pt = enc.make_paired_table(table)
    assert pt.shape[1] == 4 * enc.F
    np.testing.assert_allclose(np.asarray(enc.paired_encode(pt, x)),
                               np.asarray(enc(table, x)), atol=1e-5)


def test_train_forwards_match_under_quad(enc):
    table, x = _data(enc)
    u = jax.random.uniform(jax.random.PRNGKey(3), (enc.n_levels, x.shape[0]))
    np.testing.assert_allclose(
        np.asarray(stochastic_encode(enc, table, x, u)),
        np.asarray(enc(table, x)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(exact_encode(enc, table, x, u)),
        np.asarray(enc(table, x)), atol=1e-5)


def test_exact_backward_matches_oracle_under_quad(enc):
    table, x = _data(enc, 64)
    u = jnp.zeros((enc.n_levels, 64))
    cot = jax.random.normal(jax.random.PRNGKey(9), (64, enc.n_output_dims))
    g_exact = jax.grad(
        lambda t: jnp.sum(exact_encode(enc, t, x, u) * cot))(table)
    g_oracle = jax.grad(lambda t: jnp.sum(enc(t, x) * cot))(table)
    np.testing.assert_allclose(np.asarray(g_exact), np.asarray(g_oracle),
                               atol=1e-5, rtol=1e-5)


def test_quad_face_offsets_are_fixed():
    """hash(base + (dx, dy, 0)) == (hash(base) + dx + RY*dy) mod T for
    hashed levels — the invariant behind the 4F-wide face rows."""
    enc = HashEncoding(n_levels=1, n_features_per_level=2,
                       log2_hashmap_size=7, base_resolution=64,
                       per_level_scale=1.0, n_dims=3, hash_mode="quad")
    assert not enc.level_is_dense[0]
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 3))
    idx, _ = enc._level_indices(x, 0)
    idx = np.asarray(idx)
    T = enc.hashmap_size
    corners = enc._corners
    pos = np.asarray(x) * enc.scales[0] + 0.5
    interior = (np.floor(pos) < enc.resolutions[0] - 1).all(1)
    oy = _QUAD_RY % T
    for k in range(8):
        dx, dy, dz = corners[k]
        if dz != 0:
            continue  # z face 1 has its own (scrambled) base
        np.testing.assert_array_equal(
            idx[interior, k],
            (idx[interior, 0] + int(dx) + oy * int(dy)) % T)


def test_quad_z_is_not_additive():
    """Fog safety: consecutive z slices must NOT map to fixed row
    offsets (the lattice mode's 3-D coherent-collision mechanism)."""
    z = jnp.arange(64, dtype=jnp.uint32)
    s = np.asarray(_scramble_z(z), np.int64)
    diffs = np.unique((s[1:] - s[:-1]) % (1 << 32))
    assert len(diffs) > 32  # a fixed stride would give 1 unique diff


def test_quad_requires_3d():
    with pytest.raises(ValueError):
        HashEncoding(n_dims=2, hash_mode="quad")


@pytest.mark.parametrize("mode", ["quad", "lattice"])
def test_exact_bwd_chunked_scatter_matches_unchunked(mode, monkeypatch):
    """The size > SCATTER_ROW_CHUNK branch of the exact backward
    (chunked destination scatter + drop-row sentinel + concatenated
    fold) must produce the same table gradient as the single-scatter
    branch; shrink the chunk cap so toy levels exercise it
    (ADVICE r4: the production log2=19 path was untested)."""
    from synerfgine_tpu.nn import hash_encoding as he

    enc = HashEncoding(n_levels=4, n_features_per_level=2,
                       log2_hashmap_size=9, base_resolution=4,
                       per_level_scale=2.0, n_dims=3, hash_mode=mode)
    key = jax.random.PRNGKey(3)
    table = enc.init(key, scale=0.5)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (257, 3))
    u = jnp.zeros((enc.n_levels, x.shape[0]))

    def loss(tb):
        out = exact_encode(enc, tb, x, u)
        return jnp.sum(jnp.sin(3.0 * out))

    g_unchunked = jax.grad(loss)(table)
    # largest level is 2^9 = 512 rows; cap 128 forces 4 chunks
    monkeypatch.setattr(he, "SCATTER_ROW_CHUNK", 128)
    g_chunked = jax.grad(loss)(table)
    np.testing.assert_allclose(np.asarray(g_chunked),
                               np.asarray(g_unchunked), atol=1e-5)
