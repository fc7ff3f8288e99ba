"""Two-pass adapt_kept: live-mask + live recompaction + trainer parity.

The reference trains on a COMPACTED batch: rays are generated into a
padded buffer (16x the target, testbed_nerf.cu:3534), the forward
counts compacted_numsteps (samples until T < EPSILON,
testbed_nerf.cu:1064-1067), and the backward runs on the rays packed to
those counts in the 2^18 batch (testbed_nerf.cu:3272-3296). Our
two-pass path mirrors that shape: a no-grad density pass on the 2x
generation buffer yields the live mask, `recompact_live` packs the live
prefixes into a tight batch, and the differentiable pass runs at 1x.

These tests pin (a) the live mask against composite_compacted's own
n_live, (b) bit-equivalence of the recompacted composite (dead samples
are a per-ray suffix with zero weight), (c) the whole-ray reservation
semantics of the second compaction, and (d) trainer-level loss/grad
parity between --adapt-kept and --adapt-two-pass when nothing drops.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synerfgine_tpu.core.types import Ray
from synerfgine_tpu.grid.occupancy import OccupancyGrid
from synerfgine_tpu.march.compacted import (
    composite_compacted,
    live_mask_compacted,
    recompact_live,
)
from synerfgine_tpu.march.dda import compact_samples, march_rays_grid
from synerfgine_tpu.train.nerf_trainer import scene_aabb

R, K = 24, 128


def _compacted(budget=2048, key=2):
    aabb = scene_aabb(1)
    grid = OccupancyGrid(1)
    k = jax.random.PRNGKey(key)
    bitfield = jax.random.bernoulli(
        k, 0.5, (grid.n_cascades, grid.G, grid.G, grid.G))
    o = jnp.stack([
        jnp.full((R,), -0.7),
        jax.random.uniform(jax.random.fold_in(k, 1), (R,), minval=0.2,
                           maxval=0.8),
        jax.random.uniform(jax.random.fold_in(k, 2), (R,), minval=0.2,
                           maxval=0.8)], -1)
    d = jnp.array([0.5, 0.5, 0.5]) - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    samples = march_rays_grid(Ray(o, d), aabb, grid, bitfield, K, 0.0)
    return compact_samples(samples, (d + 1.0) * 0.5, budget,
                           whole_rays=True)


def _raw_of(xs, dirs):
    """Deterministic stand-in network: raw output as a pure function of
    the sample payload, so recompacted slots get identical raws."""
    h = jnp.concatenate([jnp.sin(xs * 13.0), jnp.cos(dirs * 7.0)], -1)
    rgb = jnp.tanh(h[:, :3] * 2.0)
    # push sigma high enough that rays terminate inside the batch
    sigma_raw = 5.5 + jnp.sin(jnp.sum(xs * 31.0, -1))
    return jnp.concatenate([rgb, sigma_raw[:, None]], -1)


def test_live_mask_matches_composite_n_live():
    comp_in = _compacted()
    raw = _raw_of(comp_in.xs, comp_in.dirs)
    live, n_live = live_mask_compacted(raw[:, 3], comp_in, R)
    comp = composite_compacted(raw, comp_in, R)
    assert int(n_live) == int(comp.n_live)
    # liveness is a per-ray prefix over the slot_valid samples: once a
    # ray's sample is dead, every later sample of that ray is dead too
    live_np = np.asarray(live)
    ray_np = np.asarray(comp_in.ray_idx)
    sv = np.asarray(comp_in.slot_valid)
    for r in np.unique(ray_np[sv]):
        m = live_np[(ray_np == r) & sv]
        assert (np.diff(m.astype(int)) <= 0).all(), f"ray {r} not a prefix"
    assert 0 < int(n_live) < int(sv.sum())  # the cut actually bites


def test_recompact_composite_bit_equivalent():
    comp_in = _compacted()
    raw = _raw_of(comp_in.xs, comp_in.dirs)
    live, n_live = live_mask_compacted(raw[:, 3], comp_in, R)
    out_size = 1024
    assert int(n_live) <= out_size
    new, ray_has = recompact_live(comp_in, live, R, out_size)
    assert bool(new.ray_kept.all())          # ample capacity: no drops
    raw_new = _raw_of(new.xs, new.dirs)
    a = composite_compacted(raw, comp_in, R)
    b = composite_compacted(raw_new, new, R)
    for x, y in [(a.rgb, b.rgb), (a.depth, b.depth),
                 (a.opacity, b.opacity),
                 (a.transmittance, b.transmittance)]:
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-4, atol=1e-5)
    assert int(b.n_live) == int(n_live)
    # n_valid carries the pre-reservation live demand (adaptation feed)
    assert int(new.n_valid) == int(n_live)
    np.testing.assert_array_equal(
        np.asarray(ray_has),
        np.asarray(jax.ops.segment_sum(
            live.astype(jnp.int32), comp_in.ray_idx,
            num_segments=R)) > 0)


def test_recompact_whole_ray_reservation():
    comp_in = _compacted()
    raw = _raw_of(comp_in.xs, comp_in.dirs)
    live, n_live = live_mask_compacted(raw[:, 3], comp_in, R)
    out_size = max(16, int(n_live) // 2)     # force pressure
    new, _ = recompact_live(comp_in, live, R, out_size)
    kept = np.asarray(new.ray_kept)
    assert not kept.all() and kept.any()
    # every slot belongs to a kept ray, and kept rays kept ALL their
    # live samples (whole-ray semantics: no tail truncation)
    sv = np.asarray(new.slot_valid)
    ray_np = np.asarray(new.ray_idx)
    assert kept[ray_np[sv]].all()
    live_counts = np.asarray(jax.ops.segment_sum(
        live.astype(jnp.int32), comp_in.ray_idx, num_segments=R))
    new_counts = np.bincount(ray_np[sv], minlength=R)
    has = live_counts > 0
    np.testing.assert_array_equal(new_counts[kept & has],
                                  live_counts[kept & has])
    assert (new_counts[~kept] == 0).all()
    # kept rays composite identically to the uncompacted batch
    a = composite_compacted(raw, comp_in, R)
    b = composite_compacted(_raw_of(new.xs, new.dirs), new, R)
    np.testing.assert_allclose(np.asarray(a.rgb)[kept & has],
                               np.asarray(b.rgb)[kept & has],
                               rtol=3e-4, atol=1e-5)


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
    net = NerfNetwork(cfg, aabb_scale=1,
                      hash_grad=kw.pop("hash_grad", "stochastic"))
    kw = {"n_rays": 256, "batch_size": 1 << 12, "n_march_steps": 64, **kw}
    return NerfTrainer(net, ds, **kw)


def test_two_pass_matches_single_pass_when_nothing_drops():
    """Ample batch + exact hash backward: the two-pass step reproduces
    the single-pass adapt_kept loss and gradients (the recompacted batch
    holds the same live samples in the same order)."""
    key = jax.random.PRNGKey(11)
    kw = dict(hash_grad="exact", batch_size=1 << 14)
    tr1 = _tiny_trainer(adapt_kept=True, **kw)
    st1 = tr1.init(jax.random.PRNGKey(0))
    st1, _ = tr1.train(st1, 4, adaptive_rays=False)
    tr2 = _tiny_trainer(adapt_kept=True, adapt_two_pass=True, **kw)

    # with the early-training L1 density pull active, the single-pass
    # step ALSO penalizes dead samples; two-pass covers exactly the
    # compacted batch (the reference's own regularizer coverage,
    # testbed_nerf.cu:1210-1265 on compacted samples), so its loss can
    # only be <= on the same params
    l1r, _, _, _ = tr1.loss_and_grads(st1.params, st1.grid, key)
    l2r, _, _, _ = tr2.loss_and_grads(st1.params, st1.grid, key)
    assert float(l2r) <= float(l1r) + 1e-6

    # gate the L1 off (mean_density above MIN_OPTICAL_THICKNESS):
    # evaluate both paths on the SAME params/grid/key — the only
    # remaining differences are float reassociation and ulp-level
    # live-mask boundaries from the paired-gather pass-1 forward
    grid_hi = st1.grid._replace(mean_density=jnp.float32(1.0))
    l1, g1, n1, aux1 = tr1.loss_and_grads(st1.params, grid_hi, key)
    l2, g2, n2, aux2 = tr2.loss_and_grads(st1.params, grid_hi, key)

    # premise check: the live demand fits the 1x batch, so the second
    # reservation drops nothing and both paths supervise the same rays
    assert int(n2) < (1 << 14)
    p1, p2 = np.asarray(aux1[2]), np.asarray(aux2[2])
    assert ((p1 != 0) == (p2 != 0)).all()
    assert float(l2) == pytest.approx(float(l1), rel=2e-4)
    # adaptation count: pass 1's pre-reservation live demand equals the
    # single-pass composite's n_live (same generation, same termination
    # rule; paired-gather forward may differ at ulp level near the cut)
    assert abs(int(n2) - int(n1)) <= 2
    np.testing.assert_allclose(np.asarray(g2.hash_table),
                               np.asarray(g1.hash_table),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g1.density_mlp),
                    jax.tree.leaves(g2.density_mlp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_two_pass_under_pressure_masks_dropped_rays():
    """Tight batch: the second reservation drops whole rays and they
    leave no residue in the per-ray aux (error-map deposit)."""
    key = jax.random.PRNGKey(3)
    tr = _tiny_trainer(adapt_kept=True, adapt_two_pass=True,
                       batch_size=256, segment_compaction=False)
    st = tr.init(jax.random.PRNGKey(0))
    st, _ = tr.train(st, 4, adaptive_rays=False)
    loss, grads, n_eff, aux = tr.loss_and_grads(st.params, st.grid, key)
    assert np.isfinite(float(loss))
    assert int(n_eff) > 0
    per_ray = np.asarray(aux[2])
    assert (per_ray == 0).sum() > 0          # pressure dropped some rays
    g = np.asarray(jnp.linalg.norm(grads.hash_table))
    assert np.isfinite(g) and g > 0


def test_two_pass_requires_adapt_kept():
    with pytest.raises(ValueError):
        _tiny_trainer(adapt_two_pass=True)
