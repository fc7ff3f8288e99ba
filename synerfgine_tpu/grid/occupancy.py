"""Cascaded occupancy (density) grid lifecycle — TPU-native.

Capability match for the reference's density grid (N7 in SURVEY.md §2):
`update_density_grid_nerf` (testbed_nerf.cu:3121-3209),
`mark_untrained_density_grid` (75-146), sample generation (148-215),
splat/EMA (217-280), `grid_to_bitfield`+`bitfield_max_pool` (285-332) and
`mark_density_grid_in_sphere_empty` (3231-3261).

TPU-native design decisions
---------------------------
- Layout: dense `(C, G, G, G)` arrays indexed `[mip, x, y, z]` instead of
  the reference's Morton order. Morton was a GPU cache trick; on TPU the
  dense layout makes the mip max-pool a reshape+max and DDA lookups plain
  gathers. Snapshot IO converts to/from Morton for format parity.
- The atomicMax splat becomes a deterministic XLA `scatter-max`
  (`.at[idx].max(v)`).
- The "probe up to 10 hashed cells for an occupied one" loop becomes 10
  random candidates + `argmax` over the pass mask — same distribution,
  static shapes.
- Cell visibility culling drops the reference's lens-distortion
  re-projection check (we gate it on distortion-free datasets) and is a
  single vectorized projection over cells x cameras.

Cascade c covers the box of side 2^c centered at (0.5,)^3; cell occupancy
semantics and thresholds (min optical thickness 0.01, decay-max EMA 0.95,
mean over cascade 0) follow the reference exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import (
    DENSITY_GRID_DECAY,
    MIN_OPTICAL_THICKNESS,
    NERF_CASCADES,
    NERF_GRIDSIZE,
    STEPSIZE,
)
from ..nn.nerf_network import density_activation


class OccupancyGridState(NamedTuple):
    density: jnp.ndarray    # (C, G, G, G) fp32; < 0 == untrained (culled)
    bitfield: jnp.ndarray   # (C, G, G, G) bool (occupancy incl. max-pooled mips)
    mean_density: jnp.ndarray  # () fp32, mean of relu(density[0])
    ema_step: jnp.ndarray   # () int32


def mip_from_pos(pos: jnp.ndarray, max_cascade: int) -> jnp.ndarray:
    """Smallest cascade whose box contains pos. (nerf_device.cuh:445-451:
    frexp exponent of max |pos-0.5| plus one, clamped.)"""
    maxval = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    _, e = jnp.frexp(jnp.maximum(maxval, 1e-12))
    return jnp.clip(e + 1, 0, max_cascade)


def mip_from_dt(dt: jnp.ndarray, pos: jnp.ndarray,
                max_cascade: int) -> jnp.ndarray:
    """Cascade matched to the step size (nerf_device.cuh:450-460): when a
    cone step spans more than half a level-0 voxel, test occupancy at the
    cascade whose cells are at least as large as the step, so a big step
    can't tunnel through a fine occupied cell untested."""
    mip = mip_from_pos(pos, max_cascade)
    dtg = dt * (2.0 * NERF_GRIDSIZE)
    _, e = jnp.frexp(jnp.maximum(dtg, 1e-12))
    return jnp.where(dtg < 1.0, mip,
                     jnp.clip(jnp.maximum(mip, e), 0, max_cascade))


def cascade_cell_of(pos: jnp.ndarray, mip: jnp.ndarray) -> jnp.ndarray:
    """Integer cell coords (..., 3) of pos within cascade `mip`."""
    scale = jnp.exp2(-mip.astype(jnp.float32))[..., None]
    p = (pos - 0.5) * scale + 0.5
    return jnp.clip((p * NERF_GRIDSIZE).astype(jnp.int32), 0, NERF_GRIDSIZE - 1)


class OccupancyGrid:
    def __init__(self, aabb_scale: int = 1, grid_size: int = NERF_GRIDSIZE):
        self.G = grid_size
        # max_cascade: highest mip such that 2^mip <= aabb_scale
        self.max_cascade = max(0, int(np.ceil(np.log2(max(aabb_scale, 1)))))
        self.n_cascades = min(self.max_cascade + 1, NERF_CASCADES)
        self.aabb_scale = aabb_scale

    # -------------------------------------------------------------- state
    def init(self) -> OccupancyGridState:
        G, C = self.G, self.n_cascades
        return OccupancyGridState(
            density=jnp.zeros((C, G, G, G), jnp.float32),
            bitfield=jnp.ones((C, G, G, G), bool),  # all-occupied until updated
            mean_density=jnp.zeros((), jnp.float32),
            ema_step=jnp.zeros((), jnp.int32),
        )

    def cell_centers(self, mip: int) -> jnp.ndarray:
        """World (NGP-space) centers of all cells of one cascade, (G^3, 3)."""
        G = self.G
        i = jnp.arange(G, dtype=jnp.float32) + 0.5
        x, y, z = jnp.meshgrid(i, i, i, indexing="ij")
        p = jnp.stack([x, y, z], -1).reshape(-1, 3) / G  # [0,1]
        return (p - 0.5) * (2.0**mip) + 0.5

    # --------------------------------------------------- visibility culling
    def mark_untrained(
        self,
        state: OccupancyGridState,
        xforms: jnp.ndarray,        # (N, 3, 4)
        resolution,                  # (W, H)
        focal_length,                # (2,)
        principal_point=(0.5, 0.5),
    ) -> OccupancyGridState:
        """Set density = -1 for cells whose corners no training camera sees
        (mark_untrained_density_grid behavior, min_count=1)."""
        G = self.G
        res = jnp.asarray(resolution, jnp.float32)
        fl = jnp.asarray(focal_length, jnp.float32)
        pp = jnp.asarray(principal_point, jnp.float32)

        def cell_visible(corners):  # corners: (M, 8, 3)
            def body(seen, xf):
                rot, t = xf[:, :3], xf[:, 3]
                rel = corners - t  # (M, 8, 3)
                p_cam = jnp.einsum("mkj,ji->mki", rel, rot,
                                   precision=jax.lax.Precision.HIGHEST)
                z = p_cam[..., 2]
                u = p_cam[..., 0] / z * fl[0] / res[0] + pp[0]
                v = p_cam[..., 1] / z * fl[1] / res[1] + pp[1]
                vis = (z > 1e-4) & (u > 0) & (u < 1) & (v > 0) & (v < 1)
                return seen | jnp.any(vis, axis=-1), None

            seen, _ = jax.lax.scan(body, jnp.zeros(corners.shape[0], bool), xforms)
            return seen

        density = state.density
        new_cascades = []
        corner_off = jnp.stack(
            jnp.meshgrid(*([jnp.array([0.0, 1.0])] * 3), indexing="ij"), -1
        ).reshape(8, 3)
        for mip in range(self.n_cascades):
            centers = self.cell_centers(mip)  # (G^3, 3) cell centers
            voxel = (2.0**mip) / G
            corners = centers[:, None, :] + (corner_off[None] - 0.5) * voxel
            seen = cell_visible(corners).reshape(G, G, G)
            d = density[mip]
            new_cascades.append(jnp.where(seen, jnp.maximum(d, 0.0), -1.0))
        return state._replace(density=jnp.stack(new_cascades))

    # ------------------------------------------------------------- update
    def _sample_cells(self, key, density, thresh: float, n: int):
        """Random (mip, cell) pairs with density > thresh (up to 10 probes,
        first hit wins) + jittered positions inside the cell."""
        G, C = self.G, self.n_cascades
        k_lvl, k_idx, k_jit = jax.random.split(key, 3)
        mip = jax.random.randint(k_lvl, (n,), 0, C)
        cand = jax.random.randint(k_idx, (n, 10), 0, G * G * G)
        vals = density.reshape(C, -1)[mip[:, None], cand]  # (n, 10)
        ok = vals > thresh
        pick = jnp.argmax(ok, axis=1)  # first passing candidate (or 0)
        idx = jnp.take_along_axis(cand, pick[:, None], axis=1)[:, 0]
        x = idx // (G * G)
        y = (idx // G) % G
        z = idx % G
        cell = jnp.stack([x, y, z], -1).astype(jnp.float32)
        jitter = jax.random.uniform(k_jit, (n, 3))
        p = (cell + jitter) / G
        pos = (p - 0.5) * jnp.exp2(mip.astype(jnp.float32))[:, None] + 0.5
        return mip, idx, pos

    def update(
        self,
        state: OccupancyGridState,
        density_fn,                 # pos (M,3) in [0,1] -> raw density (M,)
        aabb,                       # scene BoundingBox (warp target)
        key: jax.Array,
        n_uniform: int,
        n_nonuniform: int,
        decay: float = DENSITY_GRID_DECAY,
        axis_name: str | None = None,
    ) -> OccupancyGridState:
        """One decay-max EMA update + bitfield/mip rebuild.

        axis_name: inside shard_map, each shard evaluates its own
        n_uniform/n_nonuniform samples (caller divides the counts and
        folds the axis index into `key`); the scatter-max splats are
        combined across shards with pmax so the EMA sees the union."""
        G, C = self.G, self.n_cascades
        k_u, k_n = jax.random.split(key)
        mips, idxs, poss = [], [], []
        if n_uniform:
            m, i, p = self._sample_cells(k_u, state.density, -0.01, n_uniform)
            mips.append(m); idxs.append(i); poss.append(p)
        if n_nonuniform:
            m, i, p = self._sample_cells(
                k_n, state.density, MIN_OPTICAL_THICKNESS, n_nonuniform)
            mips.append(m); idxs.append(i); poss.append(p)
        mip = jnp.concatenate(mips)
        idx = jnp.concatenate(idxs)
        pos = jnp.concatenate(poss)

        xs_unit = jnp.clip(aabb.relative_pos(pos), 0.0, 1.0)
        # chunked queries: the hash encoding materializes (L, N, 8corner)
        # intermediates, so a 2M-sample batch must be mapped in slices
        # (the reference batches at 2*128^3 samples too,
        # testbed_nerf.cu:3193-3200)
        n = xs_unit.shape[0]
        chunk = 1 << 17
        if n > chunk:
            pad = (-n) % chunk
            xs_pad = jnp.concatenate([xs_unit, jnp.zeros((pad, 3))])
            raw = jax.lax.map(
                density_fn, xs_pad.reshape(-1, chunk, 3)
            ).reshape(-1)[:n]
        else:
            raw = density_fn(xs_unit)
        sigma = density_activation(raw)
        optical = sigma * STEPSIZE  # optical thickness of the min stepsize

        tmp = jnp.zeros((C, G * G * G), jnp.float32)
        tmp = tmp.at[mip, idx].max(optical)
        tmp = tmp.reshape(C, G, G, G)
        if axis_name is not None:
            tmp = jax.lax.pmax(tmp, axis_name)

        d = state.density
        new_density = jnp.where(d < 0.0, d, jnp.maximum(d * decay, tmp))
        return self.finalize(state._replace(
            density=new_density, ema_step=state.ema_step + 1))

    def finalize(self, state: OccupancyGridState) -> OccupancyGridState:
        """Recompute mean + bitfield + mip max-pool (the reference's
        `update_density_grid_mean_and_bitfield`)."""
        G = self.G
        mean = jnp.mean(jnp.maximum(state.density[0], 0.0))
        thresh = jnp.minimum(MIN_OPTICAL_THICKNESS, mean)
        bits = state.density > thresh  # (C, G, G, G)

        # Mip chain: pooled lower cascade ORed into the central half of the
        # next cascade (bitfield_max_pool behavior).
        levels = [bits[0]]
        for mip in range(1, self.n_cascades):
            prev = levels[-1]
            pooled = prev.reshape(G // 2, 2, G // 2, 2, G // 2, 2).any((1, 3, 5))
            nxt = bits[mip]
            q = G // 4
            nxt = nxt.at[q : 3 * q, q : 3 * q, q : 3 * q].set(
                nxt[q : 3 * q, q : 3 * q, q : 3 * q] | pooled
            )
            levels.append(nxt)
        bits = jnp.stack(levels)
        return state._replace(bitfield=bits, mean_density=mean)

    # ------------------------------------------------------- skip grid
    def make_skip_grid(self, bitfield: jnp.ndarray,
                       res: int = 32) -> jnp.ndarray:
        """Conservative world-space empty-space map for the renderer's
        coarse lookahead (march/windowed.py): one (res, res, res) bool
        grid over the FULL aabb (side 2^max_cascade), true iff any
        cascade has an occupied voxel in or ADJACENT to the cell
        (3^3 dilation). Point-probes at stride <= cell size against this
        grid can then prove whole stretches of a ray unoccupied: a probe
        covers every position within one cell of itself, so consecutive
        empty probes cover the segment between them. Cheap dense
        pool/roll ops; rebuild whenever the bitfield changes."""
        G = self.G
        if res & (res - 1):
            raise ValueError(f"skip-grid res must be a power of two, got {res}")
        world = jnp.zeros((res, res, res), bool)
        for c in range(self.n_cascades):
            # cascade c (side 2^c, centered) spans the central
            # res / 2^(max-c) cells of the world grid
            span = res >> (self.max_cascade - c)
            if span == 0:
                # cascade finer than one world cell: collapse to the
                # center 2^3 block
                occ = jnp.any(bitfield[c])
                q = res // 2
                world = world.at[q - 1:q + 1, q - 1:q + 1,
                                 q - 1:q + 1].max(occ)
                continue
            if G % span:
                raise ValueError(
                    f"grid size {G} not divisible by skip span {span}; "
                    f"use a power-of-two res <= {G << (self.max_cascade)}")
            f = G // span
            pooled = bitfield[c].reshape(span, f, span, f,
                                         span, f).any((1, 3, 5))
            o = (res - span) // 2
            world = world.at[o:o + span, o:o + span,
                             o:o + span].max(pooled)
        # 3^3 dilation via shifted ORs
        dil = world
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    dil = dil | jnp.roll(world, (dx, dy, dz), (0, 1, 2))
        # roll wraps across the box faces; faces are padded occupied on
        # the wrapped-in slices only if the far face was occupied — the
        # box boundary itself conservatively reads as its clamped cell,
        # so wrap artifacts only ADD occupancy (safe).
        return dil

    def skip_occupied_at(self, skip: jnp.ndarray,
                         pos: jnp.ndarray) -> jnp.ndarray:
        """Probe the skip grid at NGP-space pos (..., 3); out-of-box
        probes clamp to the boundary cell (conservative)."""
        res = skip.shape[0]
        ext = float(2 ** self.max_cascade)
        p = (pos - 0.5) / ext + 0.5
        cell = jnp.clip((p * res).astype(jnp.int32), 0, res - 1)
        return skip[cell[..., 0], cell[..., 1], cell[..., 2]]

    def skip_cell_size(self, res: int = 32) -> float:
        return float(2 ** self.max_cascade) / res

    # ----------------------------------------------------------- queries
    def occupied_at(self, bitfield: jnp.ndarray, pos: jnp.ndarray,
                    mip: jnp.ndarray) -> jnp.ndarray:
        """pos (..., 3) NGP space, mip (...,) int -> bool."""
        cell = cascade_cell_of(pos, mip)
        return bitfield[mip, cell[..., 0], cell[..., 1], cell[..., 2]]

    def occupied_at_xyz(self, bitfield: jnp.ndarray, px: jnp.ndarray,
                        py: jnp.ndarray, pz: jnp.ndarray) -> jnp.ndarray:
        """Component-planes form of occupied_at (mip derived from the
        position as in mip_from_pos): all index math runs on (..., )
        per-component tensors — no (..., 3) minor dimension — and the
        probe is ONE flat gather. The hybrid tracer's shadow ladder
        (64 probes x R rays per query) pays ~10x less for index
        arithmetic this way (r5_hybrid_probe qladder)."""
        G = self.G
        if self.max_cascade == 0:
            mip = None
            sx, sy, sz = px, py, pz
        else:
            maxval = jnp.maximum(jnp.maximum(jnp.abs(px - 0.5),
                                             jnp.abs(py - 0.5)),
                                 jnp.abs(pz - 0.5))
            _, e = jnp.frexp(jnp.maximum(maxval, 1e-12))
            # clip to the LAST REAL cascade plane (n_cascades can be
            # smaller than max_cascade+1 when aabb_scale >= 2^8): the
            # flat take() below has no per-axis clamping, and jnp.take's
            # default out-of-bounds fill is True for bools — an OOB mip
            # would read "occupied everywhere" instead of the clamped
            # plane the advanced-indexing form used
            mip = jnp.clip(e + 1, 0, self.n_cascades - 1)
            scale = jnp.exp2(-mip.astype(jnp.float32))
            sx = (px - 0.5) * scale + 0.5
            sy = (py - 0.5) * scale + 0.5
            sz = (pz - 0.5) * scale + 0.5
        cx = jnp.clip((sx * G).astype(jnp.int32), 0, G - 1)
        cy = jnp.clip((sy * G).astype(jnp.int32), 0, G - 1)
        cz = jnp.clip((sz * G).astype(jnp.int32), 0, G - 1)
        idx = (cx * G + cy) * G + cz
        if mip is not None:
            idx = idx + mip * (G * G * G)
        return jnp.take(bitfield.reshape(-1), idx)

    def density_at(self, density: jnp.ndarray, pos: jnp.ndarray,
                   mip: jnp.ndarray) -> jnp.ndarray:
        cell = cascade_cell_of(pos, mip)
        return density[mip, cell[..., 0], cell[..., 1], cell[..., 2]]

    def mark_sphere_empty(self, state: OccupancyGridState, center,
                          radius: float) -> OccupancyGridState:
        """Carve a sphere out of the grid (`mark_density_grid_in_sphere_empty`
        — used by the hybrid engine to keep NeRF out of object volumes)."""
        G = self.G
        center = jnp.asarray(center, jnp.float32)
        new = []
        for mip in range(self.n_cascades):
            centers = self.cell_centers(mip).reshape(G, G, G, 3)
            cell_radius = (2.0**mip) * float(np.sqrt(3.0)) / G
            hit = jnp.linalg.norm(centers - center, axis=-1) < radius + cell_radius
            new.append(jnp.where(hit, -1.0, state.density[mip]))
        return self.finalize(state._replace(density=jnp.stack(new)))

    # ----------------------------------------------------------- snapshot
    def to_morton(self, density: jnp.ndarray) -> np.ndarray:
        """Dense (C,G,G,G) -> reference Morton-ordered flat array."""
        from ..core.morton import inv_morton3

        G = self.G
        codes = jnp.arange(G**3, dtype=jnp.uint32)
        x, y, z = inv_morton3(codes)
        d = np.asarray(density)
        return d[:, np.asarray(x), np.asarray(y), np.asarray(z)].reshape(-1)

    def from_morton(self, flat: np.ndarray) -> np.ndarray:
        from ..core.morton import inv_morton3

        G, C = self.G, self.n_cascades
        codes = jnp.arange(G**3, dtype=jnp.uint32)
        x, y, z = (np.asarray(v) for v in inv_morton3(codes))
        out = np.zeros((C, G, G, G), np.float32)
        out[:, x, y, z] = flat.reshape(C, -1)
        return out
