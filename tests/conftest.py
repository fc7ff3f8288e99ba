"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; the standard JAX technique is a
virtual host-platform device count, letting sharding/collective tests run
anywhere (SURVEY.md §4 implication (d)).
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force the CPU backend regardless of what site customization injected
# (a remote-TPU plugin may have prepended itself to jax_platforms; its
# first initialization costs a ~70 s network handshake).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1337)


@pytest.fixture(scope="session")
def lego_dir():
    d = REFERENCE_DATA / "nerf" / "lego"
    if not d.exists():
        pytest.skip("lego dataset unavailable")
    return d


@pytest.fixture(scope="session")
def albert_exr():
    p = REFERENCE_DATA / "image" / "albert.exr"
    if not p.exists():
        pytest.skip("albert.exr unavailable")
    return p


# ---------------------------------------------------------- fast/slow tiers
# `pytest -m fast` is the CI-sized tier (measured ~8 min on this
# environment's CPU); the modules
# below carry the end-to-end / compile-heavy tests and are marked slow.
SLOW_MODULES = {
    "test_dist.py", "test_graft_entry.py", "test_testbed.py",
    "test_nerf_pipeline.py", "test_cli_mesh.py", "test_engine.py",
    "test_image_fit.py", "test_sdf.py", "test_volume.py",
    "test_pallas_mlp.py", "test_hybrid.py", "test_marching.py",
    "test_render_modes.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = pathlib.Path(str(item.fspath)).name
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: CI-sized tier (~8 min on CPU)")
    config.addinivalue_line("markers", "slow: e2e / compile-heavy tests")
