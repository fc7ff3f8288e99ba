"""Occupancy-grid-guided ray marching with cross-ray sample compaction.

Capability match for the reference's training sampler + renderer march
(N6/N8: `generate_training_samples_nerf` testbed_nerf.cu:838-991, trace
loop 2279-2435) rebuilt for TPU:

- The per-thread serial DDA ("advance_to_next_occupied_voxel") becomes a
  dense (R, K) tensor of exponential-stepping sample positions with a
  vectorized bitfield gather deciding validity. Empty space costs one
  cheap gather per step instead of an MLP evaluation.
- The atomicAdd compaction into a 2^18-sample batch becomes
  mask -> prefix-sum -> scatter (deterministic, static shapes). The
  expensive network only ever runs on the compacted S samples; results
  are gathered back into the (R, K) layout for masked compositing.
- Exponential stepping (`to/from_stepping_space`, nerf_device.cuh:379-430)
  is evaluated in closed form over the whole (R, K) grid: sample i lies at
  stepping-space coordinate n0 + i (the reference advances by 1 stepping
  unit per accepted sample).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import MAX_CONE_STEPSIZE, STEPSIZE
from ..core.types import BoundingBox, Ray
from ..grid.occupancy import OccupancyGrid, mip_from_dt, mip_from_pos


def to_stepping_space(t: jnp.ndarray, cone_angle: float) -> jnp.ndarray:
    if cone_angle <= 1e-5:
        return t / STEPSIZE
    log1p_c = math.log(1.0 + cone_angle)
    a = (math.log(STEPSIZE) - math.log(log1p_c)) / log1p_c
    b = (math.log(MAX_CONE_STEPSIZE) - math.log(log1p_c)) / log1p_c
    at = math.exp(a * log1p_c)
    bt = math.exp(b * log1p_c)
    return jnp.where(
        t <= at,
        (t - at) / STEPSIZE + a,
        jnp.where(t <= bt, jnp.log(jnp.maximum(t, 1e-12)) / log1p_c,
                  (t - bt) / MAX_CONE_STEPSIZE + b),
    )


def from_stepping_space(n: jnp.ndarray, cone_angle: float) -> jnp.ndarray:
    if cone_angle <= 1e-5:
        return n * STEPSIZE
    log1p_c = math.log(1.0 + cone_angle)
    a = (math.log(STEPSIZE) - math.log(log1p_c)) / log1p_c
    b = (math.log(MAX_CONE_STEPSIZE) - math.log(log1p_c)) / log1p_c
    at = math.exp(a * log1p_c)
    bt = math.exp(b * log1p_c)
    return jnp.where(
        n <= a,
        (n - a) * STEPSIZE + at,
        jnp.where(n <= b, jnp.exp(n * log1p_c), (n - b) * MAX_CONE_STEPSIZE + bt),
    )


def _stepping_scalar(t: float, cone_angle: float) -> float:
    """Host-side scalar to_stepping_space (pure math, no device ops)."""
    if cone_angle <= 1e-5:
        return t / STEPSIZE
    log1p_c = math.log(1.0 + cone_angle)
    a = (math.log(STEPSIZE) - math.log(log1p_c)) / log1p_c
    b = (math.log(MAX_CONE_STEPSIZE) - math.log(log1p_c)) / log1p_c
    at = math.exp(a * log1p_c)
    bt = math.exp(b * log1p_c)
    if t <= at:
        return (t - at) / STEPSIZE + a
    if t <= bt:
        return math.log(max(t, 1e-12)) / log1p_c
    return (t - bt) / MAX_CONE_STEPSIZE + b


def stepping_span_bound(
    aabb: BoundingBox,
    origins,
    cone_angle: float,
    margin_steps: int = 32,
    t_slack: float = 0.05,
) -> int:
    """Conservative upper bound on the number of stepping-space units any
    ray from `origins` (N, 3) spends inside `aabb`.

    The march lattice is n0 + i with n0 = stepping(t_enter) + jitter, so
    a ray's last in-box sample has i <= stepping(t_exit) - stepping(t_enter).
    stepping() is a global monotone map of t, and for every ray
    t_enter >= dist(origin, aabb) and t_exit <= max-corner distance, so
    span <= stepping(d_max) - stepping(d_min) per origin. With cone
    stepping (dt grows with t) cameras OUTSIDE the box need far fewer
    than NERF_STEPS units to cross it — e.g. lego at 1/256 fits in ~400
    — making a fitted K sample-set-EQUAL to the full 1024-step march
    (samples past t_exit are invalid either way) at a fraction of the
    (R, K) tensor cost. `t_slack` widens the [d_min, d_max] window and
    `margin_steps` pads the count so mild camera-optimization drift
    cannot shave true samples. Origins inside (or near) the box fall
    back toward the full linear-regime count; callers clamp to
    NERF_STEPS.
    """
    import numpy as np

    o = np.asarray(origins, np.float64).reshape(-1, 3)
    lo = np.asarray(aabb.lo, np.float64)
    hi = np.asarray(aabb.hi, np.float64)
    # distance from each origin to the box (0 inside)
    d_min = np.linalg.norm(np.maximum(np.maximum(lo - o, o - hi), 0.0),
                           axis=1)
    corners = np.stack([np.where([i & 1, i & 2, i & 4], hi, lo)
                        for i in range(8)])            # (8, 3)
    d_max = np.linalg.norm(o[:, None, :] - corners[None], axis=2).max(1)
    span = 0.0
    for a, b in zip(d_min, d_max):
        t_lo = max(a * (1.0 - t_slack), 1e-4)
        t_hi = b * (1.0 + t_slack)
        span = max(span, _stepping_scalar(t_hi, cone_angle)
                   - _stepping_scalar(t_lo, cone_angle))
    return int(math.ceil(span)) + 1 + margin_steps


class GridSamples(NamedTuple):
    t: jnp.ndarray       # (R, K)
    dt: jnp.ndarray      # (R, K)
    xs: jnp.ndarray      # (R, K, 3) NGP-space positions
    valid: jnp.ndarray   # (R, K) bool (occupied & inside)


def march_rays_grid(
    rays: Ray,
    aabb: BoundingBox,
    grid: OccupancyGrid,
    bitfield: jnp.ndarray,
    n_steps: int,
    cone_angle: float = 0.0,
    key: jax.Array | None = None,
    t_min: float = 0.0,
) -> GridSamples:
    """rays.d must be normalized. One sample per stepping-space unit."""
    o, d = rays.o, rays.d
    tmin, tmax = aabb.ray_intersect(o, d)
    tstart = jnp.maximum(jnp.maximum(tmin, t_min), 1e-4)
    if key is not None:
        jitter = jax.random.uniform(key, (o.shape[0],))
    else:
        jitter = 0.5
    n0 = to_stepping_space(tstart, cone_angle) + jitter
    i = jnp.arange(n_steps, dtype=jnp.float32)[None, :]
    n = n0[:, None] + i
    t = from_stepping_space(n, cone_angle)
    dt = from_stepping_space(n + 1.0, cone_angle) - t
    xs = o[:, None, :] + d[:, None, :] * t[..., None]
    # dt-matched cascade like the reference's training sampler
    # (testbed_nerf.cu:944,975): big exponential steps test occupancy at a
    # cascade whose cells are at least step-sized
    mip = mip_from_dt(dt, xs, grid.max_cascade)
    occ = grid.occupied_at(bitfield, xs, mip)
    valid = occ & (t < tmax[:, None]) & aabb.contains(xs)
    return GridSamples(t=t, dt=dt, xs=xs, valid=valid)


def march_rays_grid_skip(
    rays: Ray,
    aabb: BoundingBox,
    grid: OccupancyGrid,
    bitfield: jnp.ndarray,
    skip_grid: jnp.ndarray,
    n_steps: int,
    cone_angle: float = 0.0,
    key: jax.Array | None = None,
) -> GridSamples:
    """march_rays_grid with a coarse first-hit pre-pass: probe the
    dilated skip grid (grid.make_skip_grid) at cell-sized strides along
    each ray and start the dense (R, n_steps) march at the last probe
    before the first coarse hit. The probe lattice is conservative (a
    run of empty dilated probes proves the stretch unoccupied — see
    make_skip_grid), and the cursor advances by WHOLE stepping units, so
    the valid-sample set equals the full march's for every sample within
    `n_steps` of the advanced start. Lets training run n_steps < 1024
    without losing leading-object samples: the saved steps are the
    empty space between the box entry and the first occupied region.

    CAVEAT: a ray whose occupied span exceeds n_steps steps after its
    first coarse hit loses its tail samples (the full 1024-step march
    from the box entry has the same cap, measured from entry instead);
    callers choose n_steps per scene bound."""
    o, d = rays.o, rays.d
    R = o.shape[0]
    tmin, tmax = aabb.ray_intersect(o, d)
    tstart = jnp.maximum(jnp.maximum(tmin, 0.0), 1e-4)
    cell = grid.skip_cell_size(skip_grid.shape[0])
    # probes spanning the longest possible in-box path (box diagonal)
    M = int(math.ceil(math.sqrt(3.0) * skip_grid.shape[0])) + 1
    ks = jnp.arange(M, dtype=jnp.float32)
    tp = tstart[:, None] + cell * ks[None, :]
    pp = o[:, None, :] + d[:, None, :] * tp[..., None]
    hit = (grid.skip_occupied_at(skip_grid, pp)
           & (tp < tmax[:, None] + cell))
    first = jnp.min(jnp.where(hit, ks, float(M)), axis=1)
    t_skip = tstart + cell * jnp.maximum(first - 1.0, 0.0)

    if key is not None:
        jitter = jax.random.uniform(key, (R,))
    else:
        jitter = 0.5
    n0 = to_stepping_space(tstart, cone_angle) + jitter
    # advance by whole units so the sample lattice matches the
    # unskipped march
    n_sk = to_stepping_space(t_skip, cone_angle)
    n0 = n0 + jnp.maximum(jnp.floor(n_sk - n0), 0.0)

    i = jnp.arange(n_steps, dtype=jnp.float32)[None, :]
    n = n0[:, None] + i
    t = from_stepping_space(n, cone_angle)
    dt = from_stepping_space(n + 1.0, cone_angle) - t
    xs = o[:, None, :] + d[:, None, :] * t[..., None]
    mip = mip_from_dt(dt, xs, grid.max_cascade)
    occ = grid.occupied_at(bitfield, xs, mip)
    valid = occ & (t < tmax[:, None]) & aabb.contains(xs)
    return GridSamples(t=t, dt=dt, xs=xs, valid=valid)


class CompactedSamples(NamedTuple):
    xs: jnp.ndarray        # (S, 3)
    dirs: jnp.ndarray      # (S, 3) warped directions
    dt: jnp.ndarray        # (S,)
    t: jnp.ndarray         # (S,) sample distance along its ray
    ray_idx: jnp.ndarray   # (S,) int32 owning ray
    target_slot: jnp.ndarray  # (R*K,) int32 in [0, S]; S == dropped/invalid
    valid: jnp.ndarray     # (R, K) bool after capacity clipping
    n_valid: jnp.ndarray   # () int32 — samples before clipping (feedback)
    slot_valid: jnp.ndarray  # (S,) bool — slot holds a real valid sample
    # (R,) bool — ray survived capacity reservation. With whole_rays=True
    # a ray whose samples don't all fit is dropped ENTIRELY; the
    # reference additionally excludes such rays from the LOSS
    # (testbed_nerf.cu:960-968 early-returns before the ray is written
    # to the batch), so trainers must mask per-ray losses with this —
    # otherwise dropped rays contribute a spurious background-vs-target
    # residual to envmap/exposure gradients and the error map.
    ray_kept: jnp.ndarray
    # invariant: slots are ordered by (ray, t) — compaction assigns them
    # by row-major cumsum — which composite_compacted relies on


def compact_samples(
    samples: GridSamples,
    dirs_warped: jnp.ndarray,   # (R, 3)
    batch_size: int,
    whole_rays: bool = False,
) -> CompactedSamples:
    """Scatter cost is per-update on TPU (~20 ns), so compaction scatters
    ONE int32 inverse-index array and fetches the payload (xs/dt/dirs)
    with cheap gathers instead of scattering each payload tensor.

    whole_rays=True (TRAINING): capacity overflow drops ENTIRE rays,
    never a ray's tail — the reference's atomic reservation semantics
    (`base = atomicAdd(...); if (base + numsteps > max_samples) return;`
    testbed_nerf.cu:960-968). A tail-truncated ray composites its
    visible prefix against the full pixel target with background
    bleeding through the amputated far content — training on such rays
    every step diffuses density into fog (observed: lego ds1 regressed
    25.2 -> 23.6 dB between steps 512 and 1024 with ~30% steady-state
    clipping from the adaptive-ray bucket overshoot). The renderer
    keeps whole_rays=False: its windowed march re-marches clipped
    samples, so suffix clipping is lossless there."""
    R, K = samples.valid.shape
    demand = jnp.sum(samples.valid).astype(jnp.int32)  # pre-drop feedback
    ray_kept = jnp.ones((R,), bool)
    if whole_rays:
        counts = jnp.sum(samples.valid, axis=1)          # (R,)
        fits = jnp.cumsum(counts) <= batch_size           # (R,)
        samples = samples._replace(valid=samples.valid & fits[:, None])
        # zero-sample rays trivially fit the reservation (base + 0 is
        # never over budget in the reference), even past the overflow
        # point of the inclusive cumsum
        ray_kept = fits | (counts == 0)
    flat_valid = samples.valid.reshape(-1)
    pos = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    keep = flat_valid & (pos < batch_size)
    slot = jnp.where(keep, pos, batch_size)  # dump slot S

    # inverse map: slot -> flat sample index (single int scatter)
    inv = jnp.zeros((batch_size + 1,), jnp.int32).at[slot].set(
        jnp.arange(R * K, dtype=jnp.int32), mode="drop"
    )[:batch_size]

    xs = samples.xs.reshape(R * K, 3)[inv]
    dt = samples.dt.reshape(R * K)[inv]
    t = samples.t.reshape(R * K)[inv]
    ray_of = inv // K
    dirs = dirs_warped[ray_of]
    n_filled = pos[-1] + 1
    return CompactedSamples(
        xs=xs,
        dirs=dirs,
        dt=dt,
        t=t,
        ray_idx=ray_of,
        target_slot=slot,
        valid=keep.reshape(R, K),
        # feedback reports the pre-drop demand (the reference's counter
        # includes skipped rays' reservations, testbed_nerf.cu:3292)
        n_valid=demand,
        slot_valid=jnp.arange(batch_size, dtype=jnp.int32)
        < jnp.minimum(n_filled, batch_size),
        ray_kept=ray_kept,
    )


def scatter_back(net_out: jnp.ndarray, compacted: CompactedSamples,
                 R: int, K: int) -> jnp.ndarray:
    """(S, C) network outputs -> dense (R, K, C); invalid slots read zeros."""
    padded = jnp.concatenate([net_out, jnp.zeros_like(net_out[:1])], axis=0)
    return padded[compacted.target_slot].reshape(R, K, net_out.shape[-1])


def compact_samples_segmented(
    samples: GridSamples,
    dirs_warped: jnp.ndarray,   # (R, 3)
    batch_size: int,
    seg: int = 8,
    whole_rays: bool = False,
) -> CompactedSamples:
    """Segment-granular compaction: prefix-sum/scatter run over K/seg
    segments instead of K samples (8x fewer compaction elements — the
    TPU analogue of the reference's 1-8-steps-between-compactions,
    testbed_nerf.cu:2337). A segment is kept if ANY of its `seg` fine
    samples is occupied; partially-valid segments carry their fine mask,
    so the network batch trades a little occupancy for much cheaper
    bookkeeping. batch_size must be divisible by seg."""
    R, K = samples.valid.shape
    assert K % seg == 0 and batch_size % seg == 0
    S = K // seg
    n_slots = batch_size // seg

    seg_valid = samples.valid.reshape(R, S, seg).any(-1)        # (R, S)
    # pre-drop demand for the adaptive-ray feedback (see compact_samples)
    demand = jnp.sum(samples.valid & seg_valid.reshape(R, S, 1)
                     .repeat(seg, 2).reshape(R, K)).astype(jnp.int32)
    ray_kept = jnp.ones((R,), bool)
    if whole_rays:
        # whole-ray atomic reservation (reference semantics,
        # testbed_nerf.cu:960-968): a ray whose segments don't all fit
        # contributes NOTHING — no tail-truncated rays in training
        seg_counts = jnp.sum(seg_valid, axis=1)                 # (R,)
        fits = jnp.cumsum(seg_counts) <= n_slots                # (R,)
        seg_valid = seg_valid & fits[:, None]
        ray_kept = fits | (seg_counts == 0)
    flat = seg_valid.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    keep = flat & (pos < n_slots)
    slot = jnp.where(keep, pos, n_slots)

    inv = jnp.zeros((n_slots + 1,), jnp.int32).at[slot].set(
        jnp.arange(R * S, dtype=jnp.int32), mode="drop"
    )[:n_slots]                                                  # slot -> seg

    # expand segment slots to fine samples
    fine_idx = ((inv[:, None] // S) * K + (inv[:, None] % S) * seg
                + jnp.arange(seg)[None, :]).reshape(-1)          # (batch,)

    xs = samples.xs.reshape(R * K, 3)[fine_idx]
    dt = samples.dt.reshape(R * K)[fine_idx]
    t = samples.t.reshape(R * K)[fine_idx]
    ray_of = fine_idx // K
    dirs = dirs_warped[ray_of]

    # (R, K) -> flat slot of each fine sample (dump = batch_size)
    seg_slot_rk = slot.reshape(R, S)                             # (R, S)
    target = jnp.where(
        seg_slot_rk[:, :, None] < n_slots,
        seg_slot_rk[:, :, None] * seg + jnp.arange(seg)[None, None, :],
        batch_size,
    ).reshape(R, K)
    # a kept segment's individually-invalid fine samples must not
    # contribute: composite masks with `valid` below
    valid = samples.valid & (target < batch_size)
    target = jnp.where(samples.valid, target, batch_size).reshape(-1)

    n_kept_segs = jnp.sum(keep)
    slot_valid = (samples.valid.reshape(-1)[fine_idx]
                  & (jnp.arange(batch_size, dtype=jnp.int32) // seg
                     < n_kept_segs))
    return CompactedSamples(
        xs=xs, dirs=dirs, dt=dt, t=t,
        ray_idx=ray_of.astype(jnp.int32),
        target_slot=target,
        valid=valid,
        n_valid=demand,
        slot_valid=slot_valid,
        ray_kept=ray_kept,
    )
