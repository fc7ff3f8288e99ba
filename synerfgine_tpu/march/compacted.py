"""Volume compositing directly on the compacted sample batch.

The original training path scattered network outputs back to the dense
(R, K) march layout (`scatter_back`: a R*K-row gather forward and a
R*K-update scatter-add in the backward — 4.2 M transactions each at the
default shapes) and composited over (R, K). But the compacted batch is
already ordered by (ray, t) — compaction slots are assigned by a
row-major cumsum — so compositing is a SEGMENTED scan over the batch:

    optical depth  od_i = sigma_i * dt_i
    T_pre_i  = exp(-(cumsum_excl(od)_i - before[ray_i]))
    w_i      = T_pre_i * (1 - exp(-od_i))          [masked below eps]
    per-ray outputs = segment_sum over ray_idx      (tiny destination)

`before[r]` (total optical depth of earlier rays) comes from one
segment_sum + one R-length cumsum. Everything is exact — `1 - alpha`
IS `exp(-od)` — so results match `scatter_back` + `composite_rays`
bit-for-bit up to float reassociation, at ~1/16 the HBM transactions.

Invalid slots (capacity padding, fine-invalid samples inside a kept
segment) carry od = 0 and weight 0, so their position in the batch is
irrelevant; they need no reordering.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import TRAIN_T_EPS
from .dda import CompactedSamples


class CompactedComposite(NamedTuple):
    rgb: jnp.ndarray            # (R, 3) accumulated color (no background)
    depth: jnp.ndarray          # (R,) expected termination distance
    opacity: jnp.ndarray        # (R,)
    transmittance: jnp.ndarray  # (R,) T after the last live sample
    n_live: jnp.ndarray         # () int32 — samples whose incoming T was
    # still above the cut: the reference's compacted_numsteps count
    # (testbed_nerf.cu:1064-1067 counts steps until T < EPSILON), i.e.
    # the samples that can carry gradient. Ray adaptation under
    # adapt_kept targets THIS count (update_after_training adapts on
    # numsteps_counter_compacted, testbed_nerf.cu:3276-3293)


def composite_compacted(
    raw: jnp.ndarray,              # (B, 4) network output (rgb logits, log-sigma)
    comp_in: CompactedSamples,
    R: int,
    min_transmittance: float = TRAIN_T_EPS,
    T0: jnp.ndarray | None = None,  # (R,) carried-in transmittance
) -> CompactedComposite:
    """T0 lets the windowed render march carry per-ray transmittance
    across windows; default is a fresh ray (T0 = 1)."""
    sigma = jnp.exp(jnp.clip(raw[:, 3].astype(jnp.float32), -15.0, 15.0))
    sigma = jnp.where(comp_in.slot_valid, sigma, 0.0)
    od = sigma * comp_in.dt                       # (B,) optical depth
    ray = comp_in.ray_idx

    excl = jnp.cumsum(od) - od                    # global exclusive prefix
    ray_tot = jax.ops.segment_sum(od, ray, num_segments=R)
    before = jnp.cumsum(ray_tot) - ray_tot        # od of earlier rays
    T_pre = jnp.exp(-(excl - before[ray]))
    if T0 is not None:
        T_pre = T_pre * T0[ray]
    alpha = -jnp.expm1(-od)
    live = T_pre > min_transmittance
    w = jnp.where(live, T_pre * alpha, 0.0)

    rgb = jax.ops.segment_sum(
        w[:, None] * jax.nn.sigmoid(raw[:, :3].astype(jnp.float32)),
        ray, num_segments=R)
    depth = jax.ops.segment_sum(w * comp_in.t, ray, num_segments=R)
    opacity = jax.ops.segment_sum(w, ray, num_segments=R)
    # T after the early-termination cut: prod over LIVE samples only,
    # exactly composite_rays' masked product
    T_final = jnp.exp(-jax.ops.segment_sum(
        jnp.where(live, od, 0.0), ray, num_segments=R))
    if T0 is not None:
        T_final = T_final * T0
    n_live = jnp.sum((live & comp_in.slot_valid).astype(jnp.int32))
    return CompactedComposite(rgb=rgb, depth=depth, opacity=opacity,
                              transmittance=T_final, n_live=n_live)


def live_mask_compacted(
    raw_sigma: jnp.ndarray,        # (S,) raw (pre-activation) density
    comp_in: CompactedSamples,
    R: int,
    min_transmittance: float = TRAIN_T_EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slot liveness under the composite's early-termination cut.

    Identical T_pre math to `composite_compacted` (a sample is live iff
    its INCOMING transmittance is above the cut — the reference's
    compacted_numsteps rule, testbed_nerf.cu:1064-1067), computed from a
    density-only forward so a two-pass trainer can re-compact the live
    samples before the differentiable pass. od >= 0 makes T_pre
    non-increasing along a ray, so the live samples of every ray are a
    PREFIX — dropping the dead suffix cannot change any earlier T_pre,
    which is what makes the re-compacted composite bit-equivalent.

    Returns (live (S,) bool incl. the slot_valid mask, n_live () int32).
    """
    sigma = jnp.exp(jnp.clip(raw_sigma.astype(jnp.float32), -15.0, 15.0))
    sigma = jnp.where(comp_in.slot_valid, sigma, 0.0)
    od = sigma * comp_in.dt
    ray = comp_in.ray_idx
    excl = jnp.cumsum(od) - od
    ray_tot = jax.ops.segment_sum(od, ray, num_segments=R)
    before = jnp.cumsum(ray_tot) - ray_tot
    T_pre = jnp.exp(-(excl - before[ray]))
    live = (T_pre > min_transmittance) & comp_in.slot_valid
    return live, jnp.sum(live.astype(jnp.int32))


def recompact_live(
    comp_in: CompactedSamples,
    live: jnp.ndarray,             # (S,) bool from live_mask_compacted
    R: int,
    out_size: int,
) -> tuple[CompactedSamples, jnp.ndarray]:
    """Second-stage compaction: keep only LIVE samples, whole-ray
    reservation at `out_size` (a ray whose live samples don't all fit
    contributes nothing — the same atomic-reservation semantics as
    `compact_samples(whole_rays=True)`, testbed_nerf.cu:960-968, now
    applied at the reference's COMPACTED batch granularity: its backward
    runs on rays compacted to compacted_numsteps in the 2^18 batch,
    testbed_nerf.cu:3276-3293).

    Slot order is preserved, so the (ray, t) ordering invariant holds.
    The returned `.valid` / `.target_slot` still describe the ORIGINAL
    dense (R, K) layout and are NOT remapped — callers must composite
    with `composite_compacted` (never `scatter_back`). `.n_valid` is the
    pre-reservation live demand (the adaptation feedback count).

    Returns (CompactedSamples sized out_size, ray_has_live (R,) bool).
    """
    S = comp_in.xs.shape[0]
    counts = jax.ops.segment_sum(
        live.astype(jnp.int32), comp_in.ray_idx, num_segments=R)
    fits = jnp.cumsum(counts) <= out_size
    keep = live & fits[comp_in.ray_idx]
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    keep = keep & (pos < out_size)
    slot = jnp.where(keep, pos, out_size)
    inv = jnp.zeros((out_size + 1,), jnp.int32).at[slot].set(
        jnp.arange(S, dtype=jnp.int32), mode="drop"
    )[:out_size]
    n_filled = pos[-1] + 1
    ray_kept2 = fits | (counts == 0)
    new = CompactedSamples(
        xs=comp_in.xs[inv],
        dirs=comp_in.dirs[inv],
        dt=comp_in.dt[inv],
        t=comp_in.t[inv],
        ray_idx=comp_in.ray_idx[inv],
        target_slot=comp_in.target_slot,
        valid=comp_in.valid,
        n_valid=jnp.sum(live.astype(jnp.int32)),
        slot_valid=jnp.arange(out_size, dtype=jnp.int32)
        < jnp.minimum(n_filled, out_size),
        ray_kept=comp_in.ray_kept & ray_kept2,
    )
    return new, counts > 0
