"""Round-2 component profiler for the train step, run on the real chip.

Times each stage of the training step in isolation plus A/B
microbenchmarks that decide the round-2 optimizations. Every timed loop
is paced with a scalar host fetch (block_until_ready is a no-op through
the axon relay). Run one subcommand per process to stay inside the
relay's sustained-load budget:

    python scripts/profile_r2.py gather      # gather vs table size
    python scripts/profile_r2.py bitfield    # bool vs packed-bit occupancy
    python scripts/profile_r2.py stages      # march/compact/fwd/bwd/opt
    python scripts/profile_r2.py ckpt        # remat on/off A/B
    python scripts/profile_r2.py block       # scan(16) end-to-end
    python scripts/profile_r2.py grid        # occupancy-grid update cost
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

LEGO = "/root/reference/data/nerf/lego"


def sync(x):
    """Host-fetch one scalar — the only reliable device sync via relay."""
    return float(jnp.asarray(x).ravel()[0])


def bench(fn, *args, iters=8, warmup=2, **kw):
    for _ in range(warmup):
        sync(fn(*args, **kw))
    t0 = time.time()
    for _ in range(iters):
        s = sync(fn(*args, **kw))
    dt = (time.time() - t0) / iters * 1000
    return dt, s


def report(name, ms, extra=""):
    print(f"{name:<44s} {ms:9.2f} ms {extra}", flush=True)


# ---------------------------------------------------------------- gather
def cmd_gather():
    """Random-row gather cost vs source table size (does the <=4MB
    scatter speedup have a gather analogue?)."""
    key = jax.random.PRNGKey(0)
    n = 1 << 21
    for log_rows in (17, 18, 19, 20, 21, 22):
        rows = 1 << log_rows
        tbl = jnp.zeros((rows, 4), jnp.float32)  # 16 B rows
        idx = jax.random.randint(key, (n,), 0, rows)

        @jax.jit
        def g(tbl, idx):
            return tbl[idx].sum()

        ms, _ = bench(g, tbl, idx)
        report(f"gather 2M x 16B from {rows*16>>20} MB", ms)
    # paired 32 B rows for comparison
    tbl = jnp.zeros((1 << 19, 8), jnp.float32)
    idx = jax.random.randint(key, (n,), 0, 1 << 19)

    @jax.jit
    def g2(tbl, idx):
        return tbl[idx].sum()

    ms, _ = bench(g2, tbl, idx)
    report("gather 2M x 32B from 16 MB", ms)


# -------------------------------------------------------------- bitfield
def cmd_bitfield():
    """March occupancy lookup: bool (C,G,G,G) 16.7MB vs packed uint32
    bits 2.1MB vs uint8 per-cascade."""
    key = jax.random.PRNGKey(0)
    n = 1 << 22  # R*K = 4096*1024
    C, G = 8, 128
    total = C * G * G * G

    bits_bool = jnp.zeros((total,), bool)
    bits_u8 = jnp.zeros((total,), jnp.uint8)
    bits_u32 = jnp.zeros((total // 32,), jnp.uint32)
    idx = jax.random.randint(key, (n,), 0, total)

    @jax.jit
    def g_bool(b, idx):
        return b[idx].sum()

    @jax.jit
    def g_u8(b, idx):
        return b[idx].sum()

    @jax.jit
    def g_u32(b, idx):
        w = b[idx >> 5]
        return ((w >> (idx.astype(jnp.uint32) & 31)) & 1).sum()

    ms, _ = bench(g_bool, bits_bool, idx)
    report("occupancy 4M lookups, bool 16.7MB", ms)
    ms, _ = bench(g_u8, bits_u8, idx)
    report("occupancy 4M lookups, uint8 16.7MB", ms)
    ms, _ = bench(g_u32, bits_u32, idx)
    report("occupancy 4M lookups, packed u32 2.1MB", ms)


# ---------------------------------------------------------------- stages
def _setup(paired=True, use_grid=True, ckpt=True):
    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    ds = load_nerf_dataset(LEGO, downscale=2)
    cfg = NGPNetworkConfig.from_json("/root/reference/configs/nerf/base.json")
    net = NerfNetwork(cfg, aabb_scale=ds.aabb_scale, paired_fwd=paired)
    tr = NerfTrainer(net, ds, n_rays=4096, batch_size=1 << 18,
                     use_grid=use_grid)
    state = tr.init(jax.random.PRNGKey(1337))
    return tr, state


def cmd_stages():
    from synerfgine_tpu.march.dda import (
        compact_samples_segmented, march_rays_grid, scatter_back)

    tr, state = _setup()
    key = jax.random.PRNGKey(7)
    R, K, B = 4096, tr.n_march_steps, tr.batch_size

    # rays fixed outside the timed region
    img_idx, uv, texel, _ = tr._sample_pixels(tr.data, key, R)
    rays = tr._rays_for(tr.data, img_idx, uv)
    dirs_warped = (rays.d + 1.0) * 0.5

    march = jax.jit(lambda bits, k: march_rays_grid(
        rays, tr.aabb, tr.grid, bits, K, tr.cone_angle, k).t.sum())
    ms, _ = bench(march, state.grid.bitfield, key)
    report(f"march_rays_grid R={R} K={K}", ms)

    samples = jax.jit(lambda bits, k: march_rays_grid(
        rays, tr.aabb, tr.grid, bits, K, tr.cone_angle, k))(
            state.grid.bitfield, key)
    comp = jax.jit(lambda s: compact_samples_segmented(
        s, dirs_warped, B).xs.sum())
    ms, _ = bench(comp, samples)
    report("compact_samples_segmented", ms)

    comp_in = jax.jit(lambda s: compact_samples_segmented(
        s, dirs_warped, B))(samples)
    xs_unit = jnp.clip(tr.aabb.relative_pos(comp_in.xs), 0.0, 1.0)
    enc = tr.network.pos_encoding

    paired_tbl = jax.jit(enc.make_paired_table)(state.params.hash_table)
    ms, _ = bench(jax.jit(enc.make_paired_table),
                  state.params.hash_table, iters=8)
    report("make_paired_table (47->94MB rebuild)", ms)

    pe = jax.jit(lambda t, x: enc.paired_encode(t, x).sum())
    ms, _ = bench(pe, paired_tbl, xs_unit)
    report("paired_encode fwd (2^18 x 8 lvl)", ms)

    ue = jax.jit(lambda t, x: enc(t, x).sum())
    ms, _ = bench(ue, state.params.hash_table, xs_unit)
    report("8-corner encode fwd", ms)

    fwd = jax.jit(lambda p, x, d: tr.network.forward(p, x, d).sum())
    ms, _ = bench(fwd, state.params, xs_unit, comp_in.dirs)
    report("network fwd (encode+MLPs)", ms)

    grad_u = jax.random.uniform(key, (enc.n_levels, B))

    def loss_fn(p):
        out = tr.network.forward(p, xs_unit, comp_in.dirs, grad_u=grad_u)
        return (out ** 2).mean()

    vg = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)[0])
    ms, _ = bench(vg, state.params)
    report("network fwd+bwd (stoch VJP, no remat)", ms)

    lg = jax.jit(lambda p, bits, k: tr.loss_and_grads(p, bits, k)[0])
    ms, _ = bench(lg, state.params, state.grid.bitfield, key)
    report("full loss_and_grads", ms)

    grads = jax.jit(lambda p, bits, k: tr.loss_and_grads(p, bits, k)[1])(
        state.params, state.grid.bitfield, key)
    upd = jax.jit(lambda g, o, p: tr.opt.update(g, o, p)[0].hash_table.sum())
    ms, _ = bench(upd, grads, state.opt_state, state.params)
    report("optimizer update", ms)


def cmd_ckpt():
    """A/B: jax.checkpoint remat of the network in loss_and_grads."""
    import synerfgine_tpu.train.nerf_trainer as nt

    tr, state = _setup()
    key = jax.random.PRNGKey(7)
    lg = jax.jit(lambda p, bits, k: tr.loss_and_grads(p, bits, k)[0])
    ms, _ = bench(lg, state.params, state.grid.bitfield, key)
    report("loss_and_grads WITH remat", ms)

    # monkeypatch checkpoint away
    orig = jax.checkpoint
    try:
        nt.jax.checkpoint = lambda f, **kw: f
        tr2, state2 = _setup()
        lg2 = jax.jit(lambda p, bits, k: tr2.loss_and_grads(p, bits, k)[0])
        ms, _ = bench(lg2, state2.params, state2.grid.bitfield, key)
        report("loss_and_grads WITHOUT remat", ms)
    finally:
        nt.jax.checkpoint = orig


def cmd_block():
    import os

    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    remat = os.environ.get("SYNERFGINE_REMAT", "0") == "1"
    hier = os.environ.get("SYNERFGINE_HIER", "1") == "1"
    paired = os.environ.get("SYNERFGINE_PAIRED_FWD", "1") == "1"
    ds = load_nerf_dataset(LEGO, downscale=2)
    cfg = NGPNetworkConfig.from_json("/root/reference/configs/nerf/base.json")
    net = NerfNetwork(cfg, aabb_scale=ds.aabb_scale, paired_fwd=paired)
    tr = NerfTrainer(net, ds, n_rays=4096, batch_size=1 << 18,
                     use_grid=True, remat=remat)
    state = tr.init(jax.random.PRNGKey(1337))
    # warmup/compile
    state, _ = tr.train(state, 32, adaptive_rays=False)
    state, _ = tr.train(state, 16, adaptive_rays=False)
    for w in range(4):
        t0 = time.time()
        state, _ = tr.train(state, 16, adaptive_rays=False)
        dt = (time.time() - t0) / 16 * 1000
        report(f"scan(16) window {w}/step (remat={int(remat)} "
               f"hier={int(hier)} paired={int(paired)})", dt)


def cmd_grid():
    tr, state = _setup()
    upd = jax.jit(lambda s: tr._grid_update_fn(s, False).grid.density.sum())
    ms, _ = bench(upd, state, iters=4)
    M = tr.grid.n_cascades * tr.grid.G ** 3
    report(f"grid update (2 x {M//4} samples)", ms,
           f"= {ms/16:.1f} ms/step amortized")


if __name__ == "__main__":
    cmds = {"gather": cmd_gather, "bitfield": cmd_bitfield,
            "stages": cmd_stages, "ckpt": cmd_ckpt, "block": cmd_block,
            "grid": cmd_grid}
    name = sys.argv[1] if len(sys.argv) > 1 else "stages"
    print("devices:", jax.devices(), flush=True)
    cmds[name]()
