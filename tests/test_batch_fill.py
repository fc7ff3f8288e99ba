"""Exact measured-count ray adaptation + dropped-ray loss exclusion.

Pins the round-4 batch-fill redesign (`rays * target / measured` with a
traced n_active inside a static pow2 bucket — the reference's
update_after_training, testbed_nerf.cu:3272-3296) and the reference's
reservation-failure semantics: a ray dropped by whole-ray capacity
clipping, an inactive bucket-padding ray, and (without envmap training)
a zero-sample ray never enter the loss (testbed_nerf.cu:950-968), so no
background-vs-target residual leaks into envmap/exposure gradients or
the error map.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synerfgine_tpu.core.types import Ray
from synerfgine_tpu.grid.occupancy import OccupancyGrid
from synerfgine_tpu.march.dda import (
    compact_samples,
    compact_samples_segmented,
    march_rays_grid,
)
from synerfgine_tpu.train.nerf_trainer import scene_aabb


def _pressured_samples(R=24, K=128):
    aabb = scene_aabb(1)
    grid = OccupancyGrid(1)
    key = jax.random.PRNGKey(2)
    bitfield = jax.random.bernoulli(
        key, 0.5, (grid.n_cascades, grid.G, grid.G, grid.G))
    o = jnp.stack([
        jnp.full((R,), -0.7),
        jax.random.uniform(jax.random.fold_in(key, 1), (R,), minval=0.2,
                           maxval=0.8),
        jax.random.uniform(jax.random.fold_in(key, 2), (R,), minval=0.2,
                           maxval=0.8)], -1)
    d = jnp.array([0.5, 0.5, 0.5]) - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    samples = march_rays_grid(Ray(o, d), aabb, grid, bitfield, K, 0.0)
    return samples, (d + 1.0) * 0.5


def test_ray_kept_tracks_reservation():
    """ray_kept == (all my samples made the batch) | (I had none)."""
    samples, dirs = _pressured_samples()
    budget = 256
    for comp in (compact_samples(samples, dirs, budget, whole_rays=True),
                 compact_samples_segmented(samples, dirs, budget, seg=8,
                                           whole_rays=True)):
        kept = np.asarray(comp.ray_kept)
        per_ray_kept = np.asarray(comp.valid).sum(1)
        per_ray_orig = np.asarray(samples.valid).sum(1)
        # a kept ray with samples kept them ALL; a dropped ray kept none
        has = per_ray_orig > 0
        np.testing.assert_array_equal(
            kept[has], (per_ray_kept == per_ray_orig)[has])
        assert (per_ray_kept[~kept] == 0).all()
        # zero-sample rays count as kept (their reservation of 0 fits)
        assert kept[per_ray_orig == 0].all()
        # pressure was real
        assert (~kept).any()


def test_ray_kept_all_true_without_pressure():
    samples, dirs = _pressured_samples()
    comp = compact_samples(samples, dirs, 1 << 14, whole_rays=True)
    assert np.asarray(comp.ray_kept).all()
    comp = compact_samples(samples, dirs, 256, whole_rays=False)
    assert np.asarray(comp.ray_kept).all()     # render path: no drops


def _tiny_trainer(**kw):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_synthetic_dataset
    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    cfg = NGPNetworkConfig()
    cfg.encoding.n_levels = 4
    cfg.encoding.log2_hashmap_size = 10
    cfg.encoding.base_resolution = 4
    ds = _tiny_synthetic_dataset(4, 32)
    net = NerfNetwork(cfg, aabb_scale=1)
    kw = {"n_rays": 256, "batch_size": 1 << 12, "n_march_steps": 64, **kw}
    return NerfTrainer(net, ds, **kw)


def test_n_active_masks_tail_rays():
    """With n_active < R, the tail rays contribute nothing: no samples,
    no loss, zero error-map deposit."""
    tr = _tiny_trainer()
    state = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    loss_f, _, n_f, aux_f = tr.loss_and_grads(
        state.params, state.grid, key)
    loss_h, _, n_h, aux_h = tr.loss_and_grads(
        state.params, state.grid, key, n_active=jnp.int32(128))
    # same rays sampled (same key): halving actives can only reduce demand
    assert int(n_h) <= int(n_f)
    assert np.isfinite(float(loss_h))
    per_ray = np.asarray(aux_h[2])
    assert (per_ray[128:] == 0).all()
    # full-width n_active reproduces the unmasked step bit-exactly
    loss_a, _, n_a, aux_a = tr.loss_and_grads(
        state.params, state.grid, key, n_active=jnp.int32(256))
    assert float(loss_a) == pytest.approx(float(loss_f), rel=1e-6)
    assert int(n_a) == int(n_f)


def test_dropped_rays_zero_in_aux():
    """Under capacity pressure the per-ray aux (error-map deposit source)
    is zero for every ray the compaction dropped."""
    tr = _tiny_trainer(batch_size=256, segment_compaction=False)
    state = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    loss, grads, n_samples, aux = tr.loss_and_grads(
        state.params, state.grid, key)
    per_ray = np.asarray(aux[2])
    assert int(n_samples) > 256          # pressure: demand exceeds batch
    # some rays were dropped => some zero entries beyond the empty rays
    assert (per_ray == 0).sum() > 0
    assert np.isfinite(float(loss))
    # gradients remain finite and nonzero overall
    g = np.asarray(jnp.linalg.norm(grads.hash_table))
    assert np.isfinite(g)


def test_train_adaptive_exact_count():
    """The adaptive loop tracks an exact (non-pow2) ray count and the
    scanned step accepts it without recompiling per value."""
    tr = _tiny_trainer(grid_warmup_steps=4, grid_update_cadence=4)
    state = tr.init(jax.random.PRNGKey(0))
    state, losses = tr.train(state, 12, adaptive_rays=True)
    assert hasattr(tr, "_adaptive_rays")
    r = tr._adaptive_rays
    assert 512 <= r <= 1 << 16
    assert np.isfinite(losses[-1])


def test_adapt_kept_counts_live_samples():
    """adapt_kept reports the POST-TERMINATION (compacted) sample count
    (testbed_nerf.cu:1064-1067 / 3276-3293 semantics): never more than
    the generated occupied count, and the generation capacity doubles
    so the kept target can fill without whole-ray drops."""
    key = jax.random.PRNGKey(5)
    tr = _tiny_trainer()
    st = tr.init(jax.random.PRNGKey(0))
    # a few steps so densities produce real termination
    st, _ = tr.train(st, 4, adaptive_rays=False)
    _, _, n_gen, _ = tr.loss_and_grads(st.params, st.grid, key)

    trk = _tiny_trainer(adapt_kept=True)
    stk = trk.init(jax.random.PRNGKey(0))
    stk, _ = trk.train(stk, 4, adaptive_rays=False)
    loss, grads, n_kept, _ = trk.loss_and_grads(stk.params, stk.grid, key)
    assert int(n_kept) <= int(n_gen)
    assert int(n_kept) > 0
    assert np.isfinite(float(loss))

    # grads stay finite and nonzero (the doubled-capacity batch must not
    # disturb the loss/grad path)
    gh = np.asarray(grads.hash_table)
    assert np.isfinite(gh).all() and (gh != 0).any()


def test_adapt_kept_requires_compacted_grid_path():
    with pytest.raises(ValueError):
        _tiny_trainer(adapt_kept=True, use_grid=False)
    with pytest.raises(ValueError):
        _tiny_trainer(adapt_kept=True, compacted_composite=False)
