"""Reference .ingp interchange (io/ingp.py) + the tcnn XOR hash mode."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synerfgine_tpu.core.config import (
    HashGridConfig,
    MLPConfig,
    NGPNetworkConfig,
)
from synerfgine_tpu.io.ingp import export_ingp, import_ingp, read_ingp
from synerfgine_tpu.nn.nerf_network import NerfNetwork


def _cfg():
    return NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=4, n_features_per_level=2,
                                log2_hashmap_size=9, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=2),
    )


def test_xor_hash_mode_matches_tcnn_formula():
    """hash_mode='xor' must index hashed levels with the published tcnn
    hash (x*1 ^ y*p1 ^ z*p2) % T."""
    from synerfgine_tpu.nn.hash_encoding import HashEncoding, _PRIMES

    enc = HashEncoding(n_levels=1, n_features_per_level=2,
                       log2_hashmap_size=6, base_resolution=64,
                       per_level_scale=1.0, hash_mode="xor")
    assert not enc.level_is_dense[0]
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 3))
    idx, _ = enc._level_indices(x, 0)
    pos = np.floor(np.asarray(x) * enc.scales[0] + 0.5).astype(np.int64)
    base = ((pos[:, 0] ^ (pos[:, 1] * _PRIMES[1]) ^ (pos[:, 2] * _PRIMES[2]))
            % enc.hashmap_size)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], base)


def test_xor_mode_paired_fallback():
    """paired_encode under xor mode falls back to the 8-corner gather and
    equals the plain encoding."""
    from synerfgine_tpu.nn.hash_encoding import HashEncoding

    enc = HashEncoding(n_levels=3, n_features_per_level=2,
                       log2_hashmap_size=8, base_resolution=4,
                       per_level_scale=2.0, hash_mode="xor")
    tbl = enc.init(jax.random.PRNGKey(1), scale=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))
    pt = enc.make_paired_table(tbl)
    assert pt.shape == tbl.shape          # identity in xor mode
    np.testing.assert_allclose(np.asarray(enc.paired_encode(pt, x)),
                               np.asarray(enc(tbl, x)), atol=1e-6)


def test_ingp_roundtrip(tmp_path):
    """export_ingp -> import_ingp reproduces params (to fp16 precision),
    the density grid, and the step; the imported snapshot loads into an
    xor-mode network and renders finite densities."""
    from synerfgine_tpu.grid.occupancy import OccupancyGrid
    from synerfgine_tpu.io.snapshot import load_snapshot

    cfg = _cfg()
    net = NerfNetwork(cfg, aabb_scale=1, hash_mode="xor")
    params = net.init(jax.random.PRNGKey(3))
    og = OccupancyGrid(1)
    gstate = og.init()._replace(
        density=jax.random.uniform(jax.random.PRNGKey(4),
                                   og.init().density.shape))
    ingp = tmp_path / "model.ingp"
    cfg_json = {"encoding": {"otype": "HashGrid", "n_levels": 4,
                             "n_features_per_level": 2,
                             "log2_hashmap_size": 9, "base_resolution": 4,
                             "per_level_scale": 2.0},
                "network": {"n_neurons": 16, "n_hidden_layers": 1},
                "rgb_network": {"n_neurons": 16, "n_hidden_layers": 2}}
    export_ingp(str(ingp), net, params, gstate, step=1234, aabb_scale=1,
                config_json=cfg_json)

    # container sanity: zlib-wrapped msgpack with the reference keys
    blob = read_ingp(str(ingp))
    assert blob["snapshot"]["version"] == 1
    assert blob["snapshot"]["mode"] == "nerf"
    assert blob["snapshot"]["params_type"] == "__half"

    out = tmp_path / "model.sng"
    info = import_ingp(str(ingp), str(out))
    assert info["step"] == 1234

    snap = load_snapshot(str(out), hash_version=1)
    got = snap["params"]
    want = jax.tree.leaves(params)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            g, np.asarray(w, np.float16).astype(np.float32), atol=1e-7)
    np.testing.assert_allclose(
        snap["density_grid"],
        np.asarray(gstate.density, np.float16).astype(np.float32),
        atol=1e-7)

    # densities evaluate finite through the imported params
    ref = net.init(jax.random.PRNGKey(0))
    p2 = jax.tree.unflatten(jax.tree.structure(ref),
                            [jnp.asarray(a) for a in snap["params"]])
    d = net.density(p2, jax.random.uniform(jax.random.PRNGKey(5), (64, 3)))
    assert np.isfinite(np.asarray(d)).all()


def test_import_rejects_configless(tmp_path):
    from synerfgine_tpu.io.ingp import write_ingp

    p = tmp_path / "bare.ingp"
    write_ingp(str(p), {"encoding": {}})
    with pytest.raises(ValueError, match="snapshot"):
        import_ingp(str(p), str(tmp_path / "x.sng"))
