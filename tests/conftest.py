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
