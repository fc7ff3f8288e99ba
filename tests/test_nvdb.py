"""NanoVDB reader/writer round-trip (testbed_volume.cu:545-640 parity)."""
import numpy as np
import pytest


def test_nvdb_roundtrip(tmp_path):
    from synerfgine_tpu.data.nvdb import read_nvdb, write_nvdb

    rng = np.random.default_rng(0)
    dense = np.zeros((40, 24, 17), np.float32)
    # a sparse blob: some leaves occupied, most empty
    dense[4:20, 8:16, 2:10] = rng.uniform(0.1, 1.0,
                                          (16, 8, 8)).astype(np.float32)
    dense[33, 20, 15] = 0.5
    p = tmp_path / "vol.nvdb"
    write_nvdb(str(p), dense, voxel_size=0.5)
    out, info = read_nvdb(str(p))
    assert out.shape == dense.shape
    np.testing.assert_allclose(out, dense, atol=0)
    assert info["name"] == "density"
    np.testing.assert_allclose(info["voxel_size"], 0.5)


def test_nvdb_background(tmp_path):
    from synerfgine_tpu.data.nvdb import read_nvdb, write_nvdb

    dense = np.full((16, 16, 16), 0.25, np.float32)
    p = tmp_path / "v.nvdb"
    write_nvdb(str(p), dense, background=0.0)
    out, info = read_nvdb(str(p))
    np.testing.assert_allclose(out, dense)
    assert info["background"] == 0.0


def test_nvdb_rejects_garbage(tmp_path):
    from synerfgine_tpu.data.nvdb import read_nvdb

    p = tmp_path / "bad.nvdb"
    p.write_bytes(b"NOPE" * 64)
    with pytest.raises(ValueError):
        read_nvdb(str(p))


def test_testbed_volume_from_nvdb(tmp_path):
    """Testbed volume mode ingests .nvdb (testbed_volume.cu:572)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from synerfgine_tpu.data.nvdb import write_nvdb
    from synerfgine_tpu.testbed import Testbed

    rng = np.random.default_rng(1)
    dense = rng.uniform(0, 1, (16, 16, 16)).astype(np.float32)
    p = tmp_path / "cloud.nvdb"
    write_nvdb(str(p), dense)

    tb = Testbed(mode="volume", network_config={
        "encoding": {"n_levels": 2, "n_features_per_level": 2,
                     "log2_hashmap_size": 8, "base_resolution": 4,
                     "per_level_scale": 2.0},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
        "rgb_network": {"n_neurons": 16, "n_hidden_layers": 1}})
    tb.load_training_data(str(p))
    for _ in range(3):
        tb.train(1)
    assert np.isfinite(tb.loss)
