"""Multiresolution hash-grid encoding (instant-ngp), TPU-native.

Re-implements the capability of tiny-cuda-nn's `GridEncoding` (consumed by
the reference at src/testbed_nerf.cu:3611 via `create_encoding`): L levels of
feature grids with geometric resolution growth; dense indexing while a level
fits its parameter budget, spatial-hash indexing (XOR of per-dim primes)
beyond that; D-linear interpolation of 2^D corners.

TPU design notes
----------------
- One packed fp32 parameter table `(total_params, F)`; per-level offsets are
  static Python ints so XLA sees fixed slices.
- Forward: ONE fused gather over all levels' corner indices (measured ~2x
  faster than per-level gathers on TPU); the interpolation arithmetic
  fuses into the gather consumer.
- Backward (rendering/eval paths): the autodiff transpose — a
  deterministic XLA scatter-add (no atomics on TPU; no atomicAdd races).
- Backward (training hot path): `stochastic_encode`'s custom VJP below —
  unbiased single-corner importance sampling with <=4 MB scatter chunks.
- `level_mask` implements tcnn's `set_max_level` semantics (coarse-to-fine
  masking) as a multiplicative mask, which keeps shapes static.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HashEncoding", "stochastic_encode", "exact_encode"]

# Per-dimension hashing primes (tcnn's constants). Unlike tcnn, dim 0 is
# combined ADDITIVELY: h = (x + (y*p1 ^ z*p2 ^ ...)) mod size, so
# h(x+1) = h(x)+1 (mod size) exactly. That makes the two x-adjacent
# corners of every interpolation cell adjacent table rows, in hashed and
# dense levels alike — the invariant behind the aligned-pair gather
# below. Collision statistics are equivalent (x remains injective per
# (y,z) offset); only the bit pattern differs from tcnn.
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037)

# "quad" hash mode y-stride: h = x + RY*y + scramble(z) (mod T). Any
# large odd constant works; collisions within one z-slice form a 2D
# lattice whose shortest vector is ~sqrt(T) (~724 cells at T=2^19) —
# far beyond feature correlation range, unlike the fully-additive
# "lattice" mode whose 3D collision lattice (~T^(1/3) ~ 80 cells)
# measurably fogged ds1 training (PERF.md round-3 postmortem).
_QUAD_RY = 2654435761


def _scramble_z(z: jnp.ndarray) -> jnp.ndarray:
    """Murmur-style finalizer: NONLINEAR in z (shift/xor breaks the
    additive structure), so cross-slice collisions are pseudo-random.
    uint32 in/out."""
    z = z * jnp.uint32(0x9E3779B1)
    z = z ^ (z >> jnp.uint32(15))
    z = z * jnp.uint32(0x85EBCA77)
    return z ^ (z >> jnp.uint32(13))


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class HashEncoding:
    """Static metadata + pure functions for one hash-grid encoding.

    This object holds only *static* (Python) configuration; parameters live
    in a pytree created by `init` and are passed explicitly to `__call__`.
    """

    def __init__(
        self,
        n_levels: int = 8,
        n_features_per_level: int = 4,
        log2_hashmap_size: int = 19,
        base_resolution: int = 16,
        per_level_scale: float = 2.0,
        n_dims: int = 3,
        paired_fwd: bool = True,
        hash_mode: str = "additive_x",
    ):
        # paired_fwd: use the aligned-pair (double-width-row) gather in the
        # stochastic-VJP training forward. Explicit constructor flag (NOT
        # an env var read at trace time — jit caches would silently pin
        # whichever value was set first); A/B via NerfNetwork(paired_fwd=).
        self.paired_fwd = paired_fwd
        # hash_mode "additive_x" (hash_version 2): x combined additively —
        # enables the aligned-pair gather. "xor" (hash_version 1): the
        # tcnn hash (x*1 ^ y*p1 ^ z*p2) — bit-compatible with reference /
        # tiny-cuda-nn-trained tables (.ingp import, io/ingp.py); the
        # paired gather degrades transparently to the 8-corner form.
        # "lattice" (hash_version 3): fully additive
        # h = (x + K1*y + K2*z) mod T — every cell's 8 corners live at 8
        # FIXED row offsets, enabling the full-cell row layout
        # (make_cell_table / cell_encode): ONE 128 B gather fetches all
        # 8 corners, 2.1M instead of 8.4M HBM transactions per 2^18x8
        # encode (measured 128 B rows cost only 1.52x a 32 B gather).
        # Trade-off: lattice collisions are structured (shortest lattice
        # vector ~T^(1/3) ~ 80 cells) where XOR collisions are
        # pseudo-random — PSNR-validated by A/B before default adoption.
        # "quad" (hash_version 4): additive in x AND y, scrambled z —
        # h = (x + RY*y + scramble(z)) mod T. The 4 corners of each
        # z-face live at fixed offsets {0, 1, RY, RY+1}, so a
        # (4F)-wide-row table (make_quad_table) fetches a face in ONE
        # gather: 2 transactions per (sample, level) instead of the
        # aligned pair's 4, while the z scramble keeps cross-slice
        # collisions pseudo-random (the lattice fog mechanism needs
        # additivity in ALL dims). The round-3 postmortem's proposed
        # fog-safe halving of encode transactions.
        assert hash_mode in ("additive_x", "xor", "lattice", "quad"), hash_mode
        if hash_mode == "quad" and n_dims != 3:
            raise ValueError("quad hash mode is 3-D only")
        self.hash_mode = hash_mode
        self.hash_version = {"xor": 1, "additive_x": 2, "lattice": 3,
                             "quad": 4}[hash_mode]
        self.n_levels = n_levels
        self.F = n_features_per_level
        self.n_dims = n_dims
        self.hashmap_size = 1 << log2_hashmap_size
        self.base_resolution = base_resolution
        self.per_level_scale = per_level_scale
        self.log2_per_level_scale = math.log2(per_level_scale)

        scales, resolutions, sizes, offsets, dense = [], [], [], [], []
        offset = 0
        for l in range(n_levels):
            scale = 2.0 ** (l * self.log2_per_level_scale) * base_resolution - 1.0
            res = int(math.ceil(scale)) + 1
            stride = res**n_dims
            is_dense = stride <= self.hashmap_size
            size = _next_multiple(stride, 8) if is_dense else self.hashmap_size
            scales.append(scale)
            resolutions.append(res)
            sizes.append(size)
            offsets.append(offset)
            dense.append(is_dense)
            offset += size
        self.scales = tuple(scales)
        self.resolutions = tuple(resolutions)
        self.level_sizes = tuple(sizes)
        self.level_offsets = tuple(offsets)
        self.level_is_dense = tuple(dense)
        self.n_params = offset
        self.n_output_dims = n_levels * self.F

        # All 2^D corner offsets, shape (2^D, D).
        corners = np.stack(
            np.meshgrid(*([np.array([0, 1])] * n_dims), indexing="ij"), axis=-1
        ).reshape(-1, n_dims)
        self._corners = corners.astype(np.int32)
        # Corner offsets over dims 1..D-1 only (2^(D-1), D-1): the x pair
        # is handled by the aligned-pair (double-width row) gather.
        if n_dims > 1:
            rest = np.stack(
                np.meshgrid(*([np.array([0, 1])] * (n_dims - 1)),
                            indexing="ij"), axis=-1
            ).reshape(-1, n_dims - 1)
        else:
            rest = np.zeros((1, 0))
        self._corners_rest = rest.astype(np.int32)

    def level_stats(self, table) -> list[dict]:
        """Per-level parameter statistics (the reference's `LevelStats`
        histogram panel, testbed.cu:4743-4810 gather_histograms): mean,
        std (sigma), fraction of near-zero entries, min/max, and the
        level's size/offset. Host-side; cheap enough for periodic logs."""
        t = np.asarray(table)
        stats = []
        for l, (off, size, res, dense) in enumerate(zip(
                self.level_offsets, self.level_sizes, self.resolutions,
                self.level_is_dense)):
            lvl = t[off:off + size]
            stats.append({
                "level": l,
                "resolution": res,
                "dense": bool(dense),
                "size": size,
                "offset": off,
                "mean": float(lvl.mean()),
                "sigma": float(lvl.std()),
                "frac_zero": float((np.abs(lvl) < 1e-5).mean()),
                "min": float(lvl.min()),
                "max": float(lvl.max()),
            })
        return stats

    def grad_scatter_chunks(self) -> list[tuple[int, int]]:
        """(offset, size) ranges for the backward scatter, each <= 2^18
        rows (4 MB at F=4 fp32): XLA's TPU scatter-add runs ~4.5x faster
        when the output fits half of VMEM (measured 20 vs 90 ns/update);
        chunks are aligned to level boundaries so each level's updates
        touch only its own chunks."""
        C = 1 << 18
        chunks = []
        for off, size in zip(self.level_offsets, self.level_sizes):
            for j in range(0, size, C):
                chunks.append((off + j, min(C, size - j)))
        return chunks

    def init(self, key: jax.Array, scale: float = 1e-4) -> jnp.ndarray:
        """Hash table init ~ U(-1e-4, 1e-4), matching tcnn's default."""
        return jax.random.uniform(
            key, (self.n_params, self.F), jnp.float32, -scale, scale
        )

    def _level_indices(self, x: jnp.ndarray, level: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Return (corner_indices (N, 2^D) int32 into the packed table,
        weights (N, 2^D) fp32) for one level."""
        scale = self.scales[level]
        res = self.resolutions[level]
        pos = x * scale + 0.5
        idx0 = jnp.floor(pos)
        frac = pos - idx0
        idx0 = idx0.astype(jnp.int32)

        corners = jnp.asarray(self._corners)  # (C, D)
        coord = idx0[:, None, :] + corners[None, :, :]  # (N, C, D)
        coord = jnp.clip(coord, 0, res - 1)

        if self.level_is_dense[level]:
            stride = 1
            idx = jnp.zeros(coord.shape[:2], jnp.int32)
            for d in range(self.n_dims):
                idx = idx + coord[..., d] * stride
                stride *= res
        else:
            if self.hash_mode == "lattice":
                # fully additive: uint32 wrap-around then mod table size
                h = coord[..., 0].astype(jnp.uint32)
                for d in range(1, self.n_dims):
                    h = h + (coord[..., d].astype(jnp.uint32)
                             * jnp.uint32(_PRIMES[d]))
            elif self.hash_mode == "quad":
                h = (coord[..., 0].astype(jnp.uint32)
                     + coord[..., 1].astype(jnp.uint32) * jnp.uint32(_QUAD_RY)
                     + _scramble_z(coord[..., 2].astype(jnp.uint32)))
            else:
                h = jnp.zeros(coord.shape[:2], jnp.uint32)
                for d in range(1, self.n_dims):
                    h = h ^ (coord[..., d].astype(jnp.uint32)
                             * jnp.uint32(_PRIMES[d]))
                if self.hash_mode == "xor":
                    # tcnn hash (prime 1 for dim 0): bit-compatible
                    h = coord[..., 0].astype(jnp.uint32) ^ h
                else:
                    h = coord[..., 0].astype(jnp.uint32) + h  # additive x
            idx = (h % jnp.uint32(self.hashmap_size)).astype(jnp.int32)

        # D-linear interpolation weights: prod_d (corner_d ? frac : 1-frac)
        w = jnp.ones(coord.shape[:2], x.dtype)
        for d in range(self.n_dims):
            fd = frac[:, None, d]
            w = w * jnp.where(corners[None, :, d] == 1, fd, 1.0 - fd)
        return idx + self.level_offsets[level], w

    # ------------------------------------------------------ aligned pairs
    # The dominant train/render cost on TPU is the random 16 B row gather
    # from HBM (transaction-bound: 32 B rows cost the same as 16 B ones —
    # see PERF.md). Because the hash is additive in x, the two x-adjacent
    # corners of every cell are adjacent rows; storing the table as
    # double-width rows dup[i] = [t[i], t[i+1 (mod level)]] lets one
    # gather fetch both corners: 4 transactions per (sample, level)
    # instead of 8.

    def make_paired_table(self, table: jnp.ndarray) -> jnp.ndarray:
        """(n_params, F) -> (n_params, 2F); row i holds entries i and
        i+1, wrapped within i's level. Sequential HBM traffic — cheap to
        rebuild per training dispatch.

        Built as ONE whole-table roll + 8 single-row boundary fixups
        (each level's last row wraps to its own first row, not the next
        level's). The earlier per-level roll+concat materialized ~2x the
        traffic in 2L kernels and cost 33 ms/step on chip.

        In "xor" hash mode the x-adjacency invariant doesn't hold for
        hashed levels; the table is returned unchanged and
        `paired_encode` degrades to the 8-corner gather. In "lattice"
        mode this UPGRADES to the full-cell table (one gather per
        (sample, level)); `paired_encode` dispatches on row width, so
        every paired call site gets the fastest layout its hash mode
        supports."""
        if self.hash_mode == "xor":
            return table
        if self.hash_mode == "lattice":
            return self.make_cell_table(table)
        if self.hash_mode == "quad":
            return self.make_quad_table(table)
        rolled = jnp.roll(table, -1, axis=0)
        for off, size in zip(self.level_offsets, self.level_sizes):
            rolled = rolled.at[off + size - 1].set(table[off])
        return jnp.concatenate([table, rolled], axis=1)

    def _level_pair_indices(self, x: jnp.ndarray, level: int):
        """Pair-row indices for one level: (rows (N, 2^(D-1)) int32 into
        the packed table, w_rest (N, 2^(D-1)), fx (N,) x-interp weight)."""
        scale = self.scales[level]
        res = self.resolutions[level]
        pos = x * scale + 0.5
        idx0 = jnp.floor(pos)
        frac = pos - idx0
        idx0 = idx0.astype(jnp.int32)

        # base x of the pair; at the high boundary shift the pair down and
        # saturate fx so the interpolated value equals t[res-1], matching
        # the clip semantics of the 8-corner path
        bx = jnp.clip(idx0[:, 0], 0, max(res - 2, 0))
        fx = jnp.clip(pos[:, 0] - bx.astype(x.dtype), 0.0, 1.0)

        rest = jnp.asarray(self._corners_rest)             # (C2, D-1)
        coord = idx0[:, None, 1:] + rest[None, :, :]       # (N, C2, D-1)
        coord = jnp.clip(coord, 0, res - 1)

        if self.level_is_dense[level]:
            stride = res
            idx = jnp.zeros(coord.shape[:2], jnp.int32)
            for d in range(self.n_dims - 1):
                idx = idx + coord[..., d] * stride
                stride *= res
            rows = bx[:, None] + idx
        else:
            h = jnp.zeros(coord.shape[:2], jnp.uint32)
            for d in range(1, self.n_dims):
                term = (coord[..., d - 1].astype(jnp.uint32)
                        * jnp.uint32(_PRIMES[d]))
                h = (h + term) if self.hash_mode == "lattice" else (h ^ term)
            h = bx[:, None].astype(jnp.uint32) + h
            rows = (h % jnp.uint32(self.hashmap_size)).astype(jnp.int32)

        w = jnp.ones(coord.shape[:2], x.dtype)
        for d in range(self.n_dims - 1):
            fd = frac[:, None, d + 1]
            w = w * jnp.where(rest[None, :, d] == 1, fd, 1.0 - fd)
        return rows + self.level_offsets[level], w, fx

    def paired_encode(
        self,
        paired_table: jnp.ndarray,
        x: jnp.ndarray,
        level_mask: jnp.ndarray | None = None,
        compute_dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Forward identical to `__call__` but gathering from
        `make_paired_table(table)`: half the gather transactions. Use on
        no-grad paths (render, grid update) and inside the stochastic-VJP
        forward — autodiff through this would scatter into the
        double-width table, so gradient paths that need d/dx keep the
        8-corner form."""
        if paired_table.shape[1] == self.F:
            # "xor" hash mode: no pair invariant — plain 8-corner gather
            return self(paired_table, x, level_mask, compute_dtype)
        if paired_table.shape[1] == (1 << self.n_dims) * self.F:
            # "lattice" mode: full-cell rows
            return self.cell_encode(paired_table, x, level_mask,
                                    compute_dtype)
        if (self.n_dims == 3
                and paired_table.shape[1] == 4 * self.F
                and self.hash_mode == "quad"):
            return self.quad_encode(paired_table, x, level_mask,
                                    compute_dtype)
        L, F = self.n_levels, self.F
        N = x.shape[0]
        rows, ws, fxs = [], [], []
        for l in range(L):
            r, w, fx = self._level_pair_indices(x, l)
            rows.append(r)
            ws.append(w)
            fxs.append(fx)
        rows = jnp.stack(rows)                        # (L, N, C2)
        w = jnp.stack(ws)                             # (L, N, C2)
        fx = jnp.stack(fxs)                           # (L, N)
        feats = paired_table[rows.reshape(-1)].reshape(rows.shape + (2 * F,))
        lo, hi = feats[..., :F], feats[..., F:]
        pair = lo + fx[..., None, None] * (hi - lo)   # (L, N, C2, F)
        out = jnp.sum(pair * w[..., None], axis=2)    # (L, N, F)
        if level_mask is not None:
            out = out * level_mask[:, None, None]
        return jnp.moveaxis(out, 0, 1).reshape(N, L * F).astype(compute_dtype)

    # ---------------------------------------------------- full-cell rows
    # "lattice" hash mode only: every corner of a cell sits at a FIXED
    # row offset from the base corner (dense strides for dense levels,
    # K1/K2 lattice constants for hashed ones), so one (2^D * F)-wide row
    # gather fetches the whole interpolation cell: 2^D fewer HBM
    # transactions at ~1.5x the per-gather cost (PERF.md round 3).

    def _cell_strides(self, level: int) -> list[int]:
        res = self.resolutions[level]
        if self.level_is_dense[level]:
            return [res**d for d in range(self.n_dims)]
        return [1] + [int(_PRIMES[d] % self.hashmap_size)
                      for d in range(1, self.n_dims)]

    def make_cell_table(self, table: jnp.ndarray) -> jnp.ndarray:
        """(n_params, F) -> (n_params, 2^D * F); row i holds the features
        of all 2^D cell corners whose base corner hashes to i. Built from
        pure slices (contiguous copies, ~8x table traffic, no gathers);
        wrap within each level matches the mod-T hash arithmetic."""
        assert self.hash_mode == "lattice", "cell rows need the lattice hash"
        corners = self._corners                      # (2^D, D)
        parts = []
        for l, (off, size) in enumerate(zip(self.level_offsets,
                                            self.level_sizes)):
            lvl = table[off:off + size]
            strides = self._cell_strides(l)
            cols = []
            for c in corners:
                o = int(sum(int(cd) * s for cd, s in zip(c, strides))) % size
                cols.append(
                    jnp.concatenate([lvl[o:], lvl[:o]], 0) if o else lvl)
            parts.append(jnp.concatenate(cols, 1))   # (size, 2^D * F)
        return jnp.concatenate(parts, 0)

    def cell_encode(
        self,
        cell_table: jnp.ndarray,
        x: jnp.ndarray,
        level_mask: jnp.ndarray | None = None,
        compute_dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Forward identical to `__call__` (lattice hash) gathering ONE
        full-cell row per (sample, level). Boundary cells clamp the base
        and saturate the fractional weight (same clip semantics as the
        aligned-pair path)."""
        L, F, D = self.n_levels, self.F, self.n_dims
        C = 1 << D
        N = x.shape[0]
        corners = jnp.asarray(self._corners)         # (C, D)
        rows, ws = [], []
        for l in range(L):
            scale = self.scales[l]
            res = self.resolutions[l]
            pos = x * scale + 0.5
            base = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                            max(res - 2, 0))
            f = jnp.clip(pos - base.astype(x.dtype), 0.0, 1.0)
            strides = self._cell_strides(l)
            if self.level_is_dense[l]:
                row = jnp.zeros((N,), jnp.int32)
                for d in range(D):
                    row = row + base[:, d] * strides[d]
            else:
                h = base[:, 0].astype(jnp.uint32)
                for d in range(1, D):
                    h = h + base[:, d].astype(jnp.uint32) * jnp.uint32(
                        _PRIMES[d])
                row = (h % jnp.uint32(self.hashmap_size)).astype(jnp.int32)
            rows.append(row + self.level_offsets[l])
            w = jnp.ones((N, C), x.dtype)
            for d in range(D):
                fd = f[:, None, d]
                w = w * jnp.where(corners[None, :, d] == 1, fd, 1.0 - fd)
            ws.append(w)
        rows = jnp.stack(rows)                       # (L, N)
        w = jnp.stack(ws)                            # (L, N, C)
        feats = cell_table[rows.reshape(-1)].reshape(L, N, C, F)
        out = jnp.sum(feats * w[..., None], axis=2)  # (L, N, F)
        if level_mask is not None:
            out = out * level_mask[:, None, None]
        return jnp.moveaxis(out, 0, 1).reshape(N, L * F).astype(compute_dtype)

    # ------------------------------------------------------- quad rows
    # "quad" hash mode only (additive x AND y, scrambled z): the four
    # corners of a cell's z-face sit at fixed row offsets
    # {0, 1, o_y, o_y+1} from the face's base row (o_y = RY mod T for
    # hashed levels, res for dense ones), so a (4F)-wide row fetches a
    # whole face: TWO 64 B gathers per (sample, level) instead of the
    # aligned pair's four 32 B ones. 64 B transactions cost 1.22x a
    # 32 B one (PERF.md), so the encode pays ~2.44 transaction-units
    # per cell vs the pair layout's 4 — the postmortem's projected ~40%
    # encode reduction, without the lattice mode's 3-D collision fog.

    def _quad_oy(self, level: int) -> int:
        res = self.resolutions[level]
        if self.level_is_dense[level]:
            return res
        return int(_QUAD_RY % self.hashmap_size)

    def make_quad_table(self, table: jnp.ndarray) -> jnp.ndarray:
        """(n_params, F) -> (n_params, 4F); row i holds the 4 z-face
        corners whose base corner is row i: offsets [0, 1, o_y, o_y+1]
        wrapped within the level (mod-T hash arithmetic). Built from
        contiguous slices (4x sequential table traffic, no gathers)."""
        assert self.hash_mode == "quad", "quad rows need the quad hash"
        parts = []
        for l, (off, size) in enumerate(zip(self.level_offsets,
                                            self.level_sizes)):
            lvl = table[off:off + size]
            oy = self._quad_oy(l) % size
            cols = []
            for o in (0, 1, oy, (oy + 1) % size):
                cols.append(
                    jnp.concatenate([lvl[o:], lvl[:o]], 0) if o else lvl)
            parts.append(jnp.concatenate(cols, 1))    # (size, 4F)
        return jnp.concatenate(parts, 0)

    def _level_quad_indices(self, x: jnp.ndarray, level: int):
        """Face-row indices for one level: (rows (N, 2) int32 into the
        packed table — z=0 and z=1 faces), fx, fy (N,) saturated x/y
        weights, wz (N, 2) z interpolation weights."""
        scale = self.scales[level]
        res = self.resolutions[level]
        pos = x * scale + 0.5
        idx0 = jnp.floor(pos)
        frac = pos - idx0
        idx0 = idx0.astype(jnp.int32)

        # clamp the base so both +1 offsets stay in range; saturate the
        # weight so boundary cells reproduce the clip semantics of the
        # 8-corner path (same scheme as _level_pair_indices)
        bx = jnp.clip(idx0[:, 0], 0, max(res - 2, 0))
        by = jnp.clip(idx0[:, 1], 0, max(res - 2, 0))
        fx = jnp.clip(pos[:, 0] - bx.astype(x.dtype), 0.0, 1.0)
        fy = jnp.clip(pos[:, 1] - by.astype(x.dtype), 0.0, 1.0)
        cz = jnp.clip(idx0[:, 2, None] + jnp.arange(2, dtype=jnp.int32),
                      0, res - 1)                       # (N, 2)
        fz = frac[:, 2]
        wz = jnp.stack([1.0 - fz, fz], axis=-1)

        if self.level_is_dense[level]:
            rows = (bx[:, None] + by[:, None] * res + cz * res * res)
        else:
            h = (bx[:, None].astype(jnp.uint32)
                 + by[:, None].astype(jnp.uint32) * jnp.uint32(_QUAD_RY)
                 + _scramble_z(cz.astype(jnp.uint32)))
            rows = (h % jnp.uint32(self.hashmap_size)).astype(jnp.int32)
        return rows + self.level_offsets[level], fx, fy, wz

    def quad_encode(
        self,
        quad_table: jnp.ndarray,
        x: jnp.ndarray,
        level_mask: jnp.ndarray | None = None,
        compute_dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Forward identical to `__call__` (quad hash) gathering TWO
        face rows per (sample, level) from `make_quad_table(table)`."""
        L, F = self.n_levels, self.F
        N = x.shape[0]
        rows, fxs, fys, wzs = [], [], [], []
        for l in range(L):
            r, fx, fy, wz = self._level_quad_indices(x, l)
            rows.append(r)
            fxs.append(fx)
            fys.append(fy)
            wzs.append(wz)
        rows = jnp.stack(rows)                        # (L, N, 2)
        fx = jnp.stack(fxs)[..., None, None]          # (L, N, 1, 1)
        fy = jnp.stack(fys)[..., None, None]
        wz = jnp.stack(wzs)                           # (L, N, 2)
        feats = quad_table[rows.reshape(-1)].reshape(rows.shape + (4 * F,))
        # corner order within a row: (x0y0, x1y0, x0y1, x1y1)
        c00, c10 = feats[..., 0 * F:1 * F], feats[..., 1 * F:2 * F]
        c01, c11 = feats[..., 2 * F:3 * F], feats[..., 3 * F:4 * F]
        lo = c00 + fx * (c10 - c00)                   # (L, N, 2, F)
        hi = c01 + fx * (c11 - c01)
        face = lo + fy * (hi - lo)
        out = jnp.sum(face * wz[..., None], axis=2)   # (L, N, F)
        if level_mask is not None:
            out = out * level_mask[:, None, None]
        return jnp.moveaxis(out, 0, 1).reshape(N, L * F).astype(compute_dtype)

    def all_level_indices(self, x: jnp.ndarray):
        """Stacked (L, N, C) corner indices + interpolation weights."""
        idxs, ws = [], []
        for l in range(self.n_levels):
            idx, w = self._level_indices(x, l)
            idxs.append(idx)
            ws.append(w)
        return jnp.stack(idxs), jnp.stack(ws)

    def __call__(
        self,
        table: jnp.ndarray,
        x: jnp.ndarray,
        level_mask: jnp.ndarray | None = None,
        compute_dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Encode positions x (N, D) in [0,1]^D -> features (N, L*F).

        One fused gather across all levels (measured ~2x faster than
        per-level gathers on TPU). level_mask: optional (L,)
        multiplicative mask (coarse-to-fine).
        """
        L, F = self.n_levels, self.F
        N = x.shape[0]
        idx, w = self.all_level_indices(x)          # (L, N, C)
        feats = table[idx.reshape(-1)].reshape(idx.shape + (F,))
        out = jnp.sum(feats * w[..., None], axis=2)  # (L, N, F)
        if level_mask is not None:
            out = out * level_mask[:, None, None]
        return jnp.moveaxis(out, 0, 1).reshape(N, L * F).astype(compute_dtype)


# --------------------------------------------------------------------------
# Training-path encoding with a custom backward: stochastic-corner gradient
# scatter.
#
# The reference accumulates hash-table gradients with fp16 atomicAdd over
# all 8 trilinear corners (tiny-cuda-nn GridEncoding backward). On TPU,
# scatter-add throughput is the training bottleneck (no cache-backed
# atomics; XLA scatter costs ~20-90 ns/update). This backward importance-
# samples ONE corner per (sample, level) with probability equal to its
# trilinear weight and scatters the unweighted output cotangent there:
#   E[update at corner c] = w_c * g   — an unbiased estimator of the
# exact gradient with 8x fewer scatter updates. The forward pass stays
# exact. SGD/Adam on NGP is extremely noise-tolerant (the whole pipeline
# is Monte Carlo); tests pin PSNR parity vs. the exact backward.
#
# The scatter itself is chunked so every destination block is <= 2^18 rows
# (see HashEncoding.grad_scatter_chunks).
#
# SCATTER_ROW_CHUNK is the shared destination-row cap for the exact
# backward's chunked scatters (lattice + quad); module-level so tests can
# shrink it to exercise the chunked branch at toy table sizes.
SCATTER_ROW_CHUNK = 1 << 18


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def stochastic_encode(enc: HashEncoding, table: jnp.ndarray, x: jnp.ndarray,
                      u: jnp.ndarray) -> jnp.ndarray:
    """Forward == enc(table, x); backward uses stochastic-corner scatter.

    u: (n_levels, N) uniform randoms driving the corner choice.
    """
    return enc(table, x, compute_dtype=jnp.float32)


def _train_forward(enc: HashEncoding, table, x):
    """The training-path forward gather, fastest layout per hash mode:
    full-cell rows (lattice), aligned pairs (additive_x), 8-corner
    (xor / paired_fwd=False)."""
    if enc.hash_mode == "lattice":
        return enc.cell_encode(enc.make_cell_table(table), x)
    if enc.hash_mode == "quad":
        return enc.quad_encode(enc.make_quad_table(table), x)
    if enc.paired_fwd and enc.hash_mode == "additive_x":
        return enc.paired_encode(enc.make_paired_table(table), x)
    return enc(table, x, compute_dtype=jnp.float32)


def _stoch_fwd(enc: HashEncoding, table, x, u):
    idx, w = enc.all_level_indices(x)            # (L, N, C) — bwd only
    return _train_forward(enc, table, x), (idx, w, u)


def _stoch_bwd(enc: HashEncoding, res, g):
    idx, w, u = res                              # idx, w: (L, N, C)
    L, N, C = idx.shape
    F = enc.F
    g = g.reshape(N, L, F).transpose(1, 0, 2).astype(jnp.float32)  # (L,N,F)

    # first corner whose cumulative weight exceeds u (weights sum to 1)
    cw = jnp.cumsum(w, axis=2)
    thresh = u[..., None] * cw[..., -1:]
    corner = jnp.argmax(cw >= thresh, axis=2)    # (L, N)
    sel = jnp.take_along_axis(idx, corner[..., None], axis=2)[..., 0]  # (L, N)

    # level -> chunk ranges; scatter each level's updates only into its
    # own chunks, every chunk in the fast (<=4MB destination) regime.
    chunk_grads = []
    for off, size in enc.grad_scatter_chunks():
        # which level owns this chunk (chunks never span levels)
        lvl = max(i for i, lo in enumerate(enc.level_offsets) if lo <= off)
        local = sel[lvl] - off
        valid = (local >= 0) & (local < size)
        tgt = jnp.where(valid, local, size)
        part = jnp.zeros((size + 1, F), jnp.float32).at[tgt].add(
            jnp.where(valid[:, None], g[lvl], 0.0), mode="drop"
        )
        chunk_grads.append(part[:size])
    grad_table = jnp.concatenate(chunk_grads, axis=0)
    # position gradients are not propagated (the reference trains camera
    # params through a separate ray-perturbation pathway, not d(enc)/dx)
    grad_x = jnp.zeros((N, enc.n_dims), jnp.float32)
    return grad_table, grad_x, jnp.zeros_like(u)


stochastic_encode.defvjp(_stoch_fwd, _stoch_bwd)


# --------------------------------------------------------------------------
# Exact 8-corner backward (the reference's semantics: tiny-cuda-nn
# GridEncoding backward atomicAdds the weighted cotangent into ALL 2^D
# corners). Same chunked <=4 MB-destination scatter as the stochastic
# path, 8x the updates — selectable per-network (`hash_grad="exact"`)
# so the stochastic estimator can be A/B'd at the PSNR level
# (VERDICT r2 Next #2).


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def exact_encode(enc: HashEncoding, table: jnp.ndarray, x: jnp.ndarray,
                 u: jnp.ndarray) -> jnp.ndarray:
    """Forward == enc(table, x); backward scatters the exact trilinear
    gradient to all 2^D corners (chunked). `u` is ignored (signature
    matches stochastic_encode so call sites switch freely)."""
    return enc(table, x, compute_dtype=jnp.float32)


def _exact_fwd(enc: HashEncoding, table, x, u):
    if enc.hash_mode in ("lattice", "quad"):
        # residual is just x: base rows / weights are cheap VPU math,
        # recomputed in the backward (no (L, N, C) residual traffic)
        return _train_forward(enc, table, x), (x,)
    idx, w = enc.all_level_indices(x)            # (L, N, C) — bwd only
    return _train_forward(enc, table, x), (idx, w)


def _lattice_exact_bwd(enc: HashEncoding, x, g):
    """Exact all-corner gradient at ~1 wide transaction per (sample,
    level): because every corner sits at a STATIC offset from the base
    row (lattice hash), the 2^D weighted cotangents scatter as ONE
    (2^D*F)-wide row keyed by the base row, then fold onto the table
    with 2^D static rolls (sequential traffic):
        grad[r] = sum_c cellbuf[(r - offset_c) mod size, c-block]
    Same clamp/saturate cell semantics as the `cell_encode` forward."""
    L, F, D = enc.n_levels, enc.F, enc.n_dims
    C = 1 << D
    N = x.shape[0]
    corners = jnp.asarray(enc._corners)              # (C, D)
    parts = []
    for l, (off, size) in enumerate(zip(enc.level_offsets,
                                        enc.level_sizes)):
        scale = enc.scales[l]
        res = enc.resolutions[l]
        pos = x * scale + 0.5
        base = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                        max(res - 2, 0))
        f = jnp.clip(pos - base.astype(x.dtype), 0.0, 1.0)
        strides = enc._cell_strides(l)
        if enc.level_is_dense[l]:
            row = jnp.zeros((N,), jnp.int32)
            for d in range(D):
                row = row + base[:, d] * strides[d]
        else:
            h = base[:, 0].astype(jnp.uint32)
            for d in range(1, D):
                h = h + base[:, d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d])
            row = (h % jnp.uint32(enc.hashmap_size)).astype(jnp.int32)
        w = jnp.ones((N, C), jnp.float32)
        for d in range(D):
            fd = f[:, None, d].astype(jnp.float32)
            w = w * jnp.where(corners[None, :, d] == 1, fd, 1.0 - fd)
        wg = (w[:, :, None] * g[l][:, None, :]).reshape(N, C * F)
        # scatter-add is ~27 ns/update while the destination stays
        # <= 2^18 ROWS and ~99 ns above (measured, PERF.md round 3 —
        # the cutoff is row count, not bytes); chunk big levels
        RMAX = SCATTER_ROW_CHUNK
        if size <= RMAX:
            buf = jnp.zeros((size, C * F), jnp.float32).at[row].add(wg)
        else:
            parts_b = []
            for j in range(0, size, RMAX):
                n_rows = min(RMAX, size - j)
                local = row - j
                ok = (local >= 0) & (local < n_rows)
                tgt = jnp.where(ok, local, n_rows)
                parts_b.append(
                    jnp.zeros((n_rows + 1, C * F), jnp.float32)
                    .at[tgt].add(jnp.where(ok[:, None], wg, 0.0),
                                 mode="drop")[:n_rows])
            buf = jnp.concatenate(parts_b, axis=0)
        acc = jnp.zeros((size, F), jnp.float32)
        for ci in range(C):
            o = int(sum(int(cd) * s for cd, s in
                        zip(enc._corners[ci], strides))) % size
            blk = buf[:, ci * F:(ci + 1) * F]
            acc = acc + (jnp.roll(blk, o, axis=0) if o else blk)
        parts.append(acc)
    return jnp.concatenate(parts, axis=0)


def _quad_exact_bwd(enc: HashEncoding, x, g):
    """Exact all-corner gradient under the quad hash at TWO wide
    scatters per (sample, level): a cell's 8 corners are two z-faces,
    each a (4F)-wide row at a STATIC offset set {0, 1, o_y, o_y+1}
    from its base row (additive x/y), so the weighted cotangents
    scatter as (N, 2) face rows of width 4F and fold onto the table
    with 4 static rolls per level — the lattice cell-row trick
    (f273d75) at quad granularity, 4x fewer scatter rows than the
    generic 8-corner path and fog-safe (scrambled z keeps collisions
    unstructured). Row/weight math recomputes `_level_quad_indices`
    so backward clamp semantics match the forward exactly."""
    L, F = enc.n_levels, enc.F
    N = x.shape[0]
    RMAX = SCATTER_ROW_CHUNK
    parts = []
    for l, (off, size) in enumerate(zip(enc.level_offsets,
                                        enc.level_sizes)):
        rows, fx, fy, wz = enc._level_quad_indices(x, l)
        row = rows - off                                    # (N, 2) local
        fx = fx.astype(jnp.float32)
        fy = fy.astype(jnp.float32)
        # corner order within a row: (x0y0, x1y0, x0y1, x1y1)
        cw = jnp.stack([(1.0 - fx) * (1.0 - fy), fx * (1.0 - fy),
                        (1.0 - fx) * fy, fx * fy], axis=-1)  # (N, 4)
        # (N, 2, 4, F): face weight x corner weight x cotangent
        wg = (wz.astype(jnp.float32)[:, :, None, None]
              * cw[:, None, :, None] * g[l][:, None, None, :])
        wg = wg.reshape(N * 2, 4 * F)
        row = row.reshape(N * 2)
        if size <= RMAX:
            buf = jnp.zeros((size, 4 * F), jnp.float32).at[row].add(wg)
        else:
            parts_b = []
            for j in range(0, size, RMAX):
                n_rows = min(RMAX, size - j)
                local = row - j
                ok = (local >= 0) & (local < n_rows)
                tgt = jnp.where(ok, local, n_rows)
                parts_b.append(
                    jnp.zeros((n_rows + 1, 4 * F), jnp.float32)
                    .at[tgt].add(jnp.where(ok[:, None], wg, 0.0),
                                 mode="drop")[:n_rows])
            buf = jnp.concatenate(parts_b, axis=0)
        oy = enc._quad_oy(l) % size
        acc = jnp.zeros((size, F), jnp.float32)
        for k, o in enumerate((0, 1, oy, (oy + 1) % size)):
            blk = buf[:, k * F:(k + 1) * F]
            acc = acc + (jnp.roll(blk, o, axis=0) if o else blk)
        parts.append(acc)
    return jnp.concatenate(parts, axis=0)


def _exact_bwd(enc: HashEncoding, res, g):
    if enc.hash_mode in ("lattice", "quad"):
        (x,) = res
        N = x.shape[0]
        L, F = enc.n_levels, enc.F
        g = g.reshape(N, L, F).transpose(1, 0, 2).astype(jnp.float32)
        grad_table = (_lattice_exact_bwd(enc, x, g)
                      if enc.hash_mode == "lattice"
                      else _quad_exact_bwd(enc, x, g))
        return (grad_table, jnp.zeros((N, enc.n_dims), jnp.float32),
                jnp.zeros((L, N), jnp.float32))
    idx, w = res                                 # (L, N, C)
    L, N, C = idx.shape
    F = enc.F
    g = g.reshape(N, L, F).transpose(1, 0, 2).astype(jnp.float32)  # (L,N,F)
    wg = w[..., None].astype(jnp.float32) * g[:, :, None, :]       # (L,N,C,F)

    chunk_grads = []
    for off, size in enc.grad_scatter_chunks():
        lvl = max(i for i, lo in enumerate(enc.level_offsets) if lo <= off)
        local = (idx[lvl] - off).reshape(-1)                 # (N*C,)
        valid = (local >= 0) & (local < size)
        tgt = jnp.where(valid, local, size)
        part = jnp.zeros((size + 1, F), jnp.float32).at[tgt].add(
            jnp.where(valid[:, None], wg[lvl].reshape(-1, F), 0.0),
            mode="drop",
        )
        chunk_grads.append(part[:size])
    grad_table = jnp.concatenate(chunk_grads, axis=0)
    grad_x = jnp.zeros((N, enc.n_dims), jnp.float32)
    return grad_table, grad_x, jnp.zeros((L, N), jnp.float32)


exact_encode.defvjp(_exact_fwd, _exact_bwd)
