"""composite_compacted == scatter_back + composite_rays (values AND
gradients), for both compaction flavors — the round-3 structural perf
fix must be a pure program transformation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synerfgine_tpu.core.types import Ray
from synerfgine_tpu.grid.occupancy import OccupancyGrid
from synerfgine_tpu.march.compacted import composite_compacted
from synerfgine_tpu.march.composite import composite_rays
from synerfgine_tpu.march.dda import (
    compact_samples,
    compact_samples_segmented,
    march_rays_grid,
    scatter_back,
)
from synerfgine_tpu.train.nerf_trainer import scene_aabb

R, K = 32, 64


@pytest.fixture(scope="module", params=["flat", "segmented", "clipped"])
def case(request):
    aabb = scene_aabb(1)
    grid = OccupancyGrid(1)
    key = jax.random.PRNGKey(3)
    k_bf, k_o = jax.random.split(key)
    bitfield = jax.random.bernoulli(
        k_bf, 0.5, (grid.n_cascades, grid.G, grid.G, grid.G))
    o = jnp.stack([jnp.full((R,), -0.8),
                   jnp.linspace(0.15, 0.85, R),
                   jnp.full((R,), 0.5)], axis=-1)
    d = jax.random.normal(k_o, (R, 3)) * 0.1 + jnp.asarray([1.0, 0.0, 0.0])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    samples = march_rays_grid(Ray(o, d), aabb, grid, bitfield, K, 0.0, None)
    dirs_warped = (d + 1.0) * 0.5
    if request.param == "flat":
        comp_in = compact_samples(samples, dirs_warped, R * K)
    elif request.param == "segmented":
        comp_in = compact_samples_segmented(samples, dirs_warped, R * K)
    else:  # capacity clipping engaged
        comp_in = compact_samples_segmented(samples, dirs_warped, 256)
    B = comp_in.xs.shape[0]
    raw = jax.random.normal(jax.random.fold_in(key, 7), (B, 4))
    raw = raw.at[:, 3].add(2.0)  # denser so transmittance cut engages
    return samples, comp_in, raw


def _dense_ref(raw, samples, comp_in, min_t):
    dense = scatter_back(raw, comp_in, R, K)
    return composite_rays(dense[..., :3], dense[..., 3], samples.dt,
                          samples.t, comp_in.valid, min_t)


@pytest.mark.parametrize("min_t", [1e-4, 0.05])
def test_values_match(case, min_t):
    samples, comp_in, raw = case
    ref = _dense_ref(raw, samples, comp_in, min_t)
    got = composite_compacted(raw, comp_in, R, min_t)
    np.testing.assert_allclose(got.rgb, ref.rgb, atol=1e-5)
    np.testing.assert_allclose(got.depth, ref.depth, atol=1e-5)
    np.testing.assert_allclose(got.opacity, ref.opacity, atol=1e-5)
    np.testing.assert_allclose(got.transmittance, ref.transmittance,
                               atol=1e-5)


def test_gradients_match(case):
    samples, comp_in, raw = case
    tgt = jax.random.uniform(jax.random.PRNGKey(0), (R, 3))

    def loss_ref(r):
        c = _dense_ref(r, samples, comp_in, 1e-4)
        pred = c.rgb + c.transmittance[:, None]
        return jnp.mean((pred - tgt) ** 2) + 0.1 * jnp.mean(c.depth)

    def loss_new(r):
        c = composite_compacted(r, comp_in, R, 1e-4)
        pred = c.rgb + c.transmittance[:, None]
        return jnp.mean((pred - tgt) ** 2) + 0.1 * jnp.mean(c.depth)

    g_ref = jax.grad(loss_ref)(raw)
    g_new = jax.grad(loss_new)(raw)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=2e-6)


def test_trainer_loss_parity(lego_dir):
    """End-to-end: compacted vs dense composite trainers produce the
    same loss trajectory from the same seed."""
    from synerfgine_tpu.core.config import (
        HashGridConfig, MLPConfig, NGPNetworkConfig)
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    ds = load_nerf_dataset(lego_dir, max_images=2, downscale=16)
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1))

    losses = {}
    for mode in (True, False):
        net = NerfNetwork(cfg, aabb_scale=ds.aabb_scale)
        tr = NerfTrainer(net, ds, n_rays=128, batch_size=1024,
                         n_march_steps=64, use_grid=True,
                         grid_warmup_steps=0, grid_update_cadence=4,
                         compacted_composite=mode)
        state = tr.init(jax.random.PRNGKey(11))
        ls = []
        for _ in range(4):
            state, l = tr.step(state)
            ls.append(float(l))
        losses[mode] = ls
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-4, atol=1e-6)
