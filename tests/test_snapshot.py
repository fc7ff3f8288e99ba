import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.io.snapshot import save_snapshot, load_snapshot, restore_train_state
from synerfgine_tpu.data import load_nerf_dataset
from synerfgine_tpu.train.nerf_trainer import NerfTrainer
from synerfgine_tpu.nn.nerf_network import NerfNetwork
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig


def _tiny_network():
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    return NerfNetwork(cfg)


def test_snapshot_roundtrip(tmp_path, lego_dir):
    ds = load_nerf_dataset(lego_dir, max_images=2, downscale=16)
    net = _tiny_network()
    tr = NerfTrainer(net, ds, n_rays=32, n_march_steps=32, batch_size=256,
                     use_grid=True, grid_warmup_steps=1, grid_update_cadence=4)
    state = tr.init(jax.random.PRNGKey(0))
    for _ in range(3):
        state, loss = tr.step(state)

    path = str(tmp_path / "snap.sng")
    save_snapshot(
        path, state.params, state.opt_state, state.grid,
        step=tr.host_step, config={"loss": "huber"},
        dataset_meta={"n_images": ds.n_images}, include_optimizer=True,
    )
    snap = load_snapshot(path)
    assert snap["step"] == 3
    assert snap["config"]["loss"] == "huber"
    assert snap["dataset_meta"]["n_images"] == 2

    tr2 = NerfTrainer(net, ds, n_rays=32, n_march_steps=32, batch_size=256,
                      use_grid=True, grid_warmup_steps=1, grid_update_cadence=4)
    state2 = restore_train_state(tr2, snap)
    # params identical
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state identical
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # density grid fp16 roundtrip
    np.testing.assert_allclose(
        np.asarray(state.grid.density), np.asarray(state2.grid.density),
        atol=1e-3, rtol=1e-2,
    )
    assert tr2.host_step == 3
    # both continue producing identical renders
    out1 = tr.render_image(state.params, ds.xforms[0], width=16, height=16,
                           n_steps=16)
    out2 = tr2.render_image(state2.params, ds.xforms[0], width=16, height=16,
                            n_steps=16)
    np.testing.assert_allclose(out1["rgb"], out2["rgb"], atol=1e-6)


def test_snapshot_no_optimizer(tmp_path):
    net = _tiny_network()
    params = net.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "p.sng")
    save_snapshot(path, params, include_optimizer=False)
    snap = load_snapshot(path)
    assert snap["opt_state"] is None
    assert len(snap["params"]) == len(jax.tree.leaves(params))


def test_snapshot_quad_version_and_adaptive_rays(tmp_path):
    """hash_version 4 (quad) snapshots carry their version through the
    gate, and the adaptive ray count survives the roundtrip."""
    net = _tiny_network()
    params = net.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "q.sng")
    save_snapshot(path, params, hash_version=4, adaptive_rays=6789)
    snap = load_snapshot(path, hash_version=4)
    assert snap["hash_version"] == 4
    assert snap["adaptive_rays"] == 6789
    import pytest

    with pytest.raises(ValueError, match="hash_version"):
        load_snapshot(path)  # default gate (v2) must refuse a quad table


def test_snapshot_rejects_garbage(tmp_path):
    p = tmp_path / "bad.sng"
    p.write_bytes(b"NOPE123456")
    import pytest

    with pytest.raises(ValueError):
        load_snapshot(str(p))


def test_snapshot_rejects_old_hash_version(tmp_path):
    """Tables trained under the pre-aligned-pair XOR hash (hash_version 1,
    or absent) must refuse to load: they'd resume without error but
    gather the wrong rows."""
    import msgpack
    import pytest
    import zlib

    net = _tiny_network()
    params = net.init(jax.random.PRNGKey(1))
    path = tmp_path / "old.sng"
    save_snapshot(str(path), params)
    # rewrite the payload with the old hash version
    raw = zlib.decompress(path.read_bytes()[4:])
    payload = msgpack.unpackb(raw, raw=False)
    assert payload["hash_version"] == 2
    payload["hash_version"] = 1
    path.write_bytes(b"SNGZ" + zlib.compress(
        msgpack.packb(payload, use_bin_type=True)))
    with pytest.raises(ValueError, match="hash_version"):
        load_snapshot(str(path))
    # absent field == version 1 == refuse
    del payload["hash_version"]
    path.write_bytes(b"SNGZ" + zlib.compress(
        msgpack.packb(payload, use_bin_type=True)))
    with pytest.raises(ValueError, match="hash_version"):
        load_snapshot(str(path))
