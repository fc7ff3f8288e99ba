"""Span-fitted march K (march/dda.py stepping_span_bound): the fitted K
must be sample-set-EQUAL to the full NERF_STEPS march — every valid
sample of the 1024-step march lies in the first K slots — while being
substantially smaller for cameras outside the aabb under cone stepping."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synerfgine_tpu.core.constants import NERF_STEPS
from synerfgine_tpu.core.types import Ray
from synerfgine_tpu.grid.occupancy import OccupancyGrid
from synerfgine_tpu.march.dda import march_rays_grid, stepping_span_bound
from synerfgine_tpu.train.nerf_trainer import scene_aabb

CONE = 1.0 / 256.0


def _ring_origins(n=12, radius=1.3, y=0.9, center=0.5):
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([center + radius * np.cos(a),
                     np.full(n, y),
                     center + radius * np.sin(a)], axis=1)


def test_fitted_k_is_much_smaller_outside():
    aabb = scene_aabb(1)
    k = stepping_span_bound(aabb, _ring_origins(), CONE)
    assert 64 < k < NERF_STEPS // 2, k


def test_fitted_k_larger_inside_than_outside():
    aabb = scene_aabb(1)
    corner = np.array([[0.01, 0.01, 0.01]])   # worst case: full diagonal
    k_in = stepping_span_bound(aabb, corner, CONE)
    k_out = stepping_span_bound(aabb, _ring_origins(), CONE)
    # inside the box the march starts in the fine linear regime -> a
    # much larger (but still sub-1024) bound than a ring outside
    assert k_in > k_out + 100
    # without cone stepping a corner origin needs ~the full count
    assert stepping_span_bound(aabb, corner, 0.0) >= NERF_STEPS


@pytest.mark.parametrize("cone", [0.0, CONE])
def test_fitted_march_is_sample_set_equal(rng, cone):
    aabb = scene_aabb(1)
    grid = OccupancyGrid(aabb_scale=1)
    bits = jnp.asarray(rng.uniform(size=(1, 128, 128, 128)) < 0.2)
    origins = _ring_origins(8)
    k_fit = stepping_span_bound(aabb, origins, cone)
    k_fit = min(NERF_STEPS, max(64, -(-k_fit // 64) * 64))

    # rays from each origin toward random points in the box
    R = 64
    o = np.repeat(origins, R // 8, axis=0)
    target = rng.uniform(0.1, 0.9, size=(R, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Ray(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    key = jax.random.PRNGKey(7)

    full = march_rays_grid(rays, aabb, grid, bits, NERF_STEPS, cone, key)
    fit = march_rays_grid(rays, aabb, grid, bits, k_fit, cone, key)

    # identical lattice prefix...
    np.testing.assert_allclose(np.asarray(full.t[:, :k_fit]),
                               np.asarray(fit.t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(full.valid[:, :k_fit]),
                                  np.asarray(fit.valid))
    # ...and NO valid samples beyond the fitted span
    assert not bool(jnp.any(full.valid[:, k_fit:]))


def test_trainer_flag_clamps_k(rng):
    from __graft_entry__ import _tiny_synthetic_dataset
    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    ds = _tiny_synthetic_dataset(4, 16)
    net = NerfNetwork(NGPNetworkConfig(), aabb_scale=ds.aabb_scale)
    base = NerfTrainer(net, ds, n_rays=64, batch_size=512)
    fit = NerfTrainer(net, ds, n_rays=64, batch_size=512,
                      fit_march_span=True)
    assert base.n_march_steps == NERF_STEPS
    assert 64 <= fit.n_march_steps < NERF_STEPS
    assert fit.n_march_steps % 64 == 0
