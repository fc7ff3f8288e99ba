"""Round-3 step attribution on the real chip (VERDICT r2 Next #3).

Protocol (PERF.md "relay variance"): all variants run INTERLEAVED in the
same process/session, each as a jitted 8-step scan (amortizing the
~30 ms dispatch floor to <4 ms/step), 3 rounds, median reported. The
variants are nested supersets so differences attribute the step:

  march      march + segment compaction                  (no network)
  dense_fwd  + scatter_back(const) + composite + loss    (no net, fwd)
  dense_fb   same, + backward                            (no net, fwd+bwd)
  fwd        + real network forward                      (fwd only)
  fb         + backward (stochastic hash VJP)            == loss_and_grads
  fb_exact   backward with exact 8-corner hash VJP
  step       fb + optimizer update
  fb_seg     fb with the compacted-batch composite       (candidate fix:
             no scatter_back, no dense (R,K) composite)

Also: 64 B-row gather microbench (quad-row hash layout feasibility).

Run:  python scripts/profile_r3.py stages
      python scripts/profile_r3.py gather64
"""
from __future__ import annotations

import os
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

LEGO = "/root/reference/data/nerf/lego"
SNAP = os.environ.get(
    "PROFILE_SNAPSHOT",
    "/root/repo/docs/experiments/ab_r3/base_ds2/model.sng")
R, SCAN = 4096, 8


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        sync(fn(*args))
        times.append((time.time() - t0) * 1000)
    return times


def _setup():
    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.io.snapshot import load_snapshot, restore_train_state
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    ds = load_nerf_dataset(LEGO, downscale=2)
    cfg = NGPNetworkConfig.from_json("/root/reference/configs/nerf/base.json")
    net = NerfNetwork(cfg, aabb_scale=ds.aabb_scale)
    tr = NerfTrainer(net, ds, n_rays=R, batch_size=1 << 18, use_grid=True)
    state = tr.init(jax.random.PRNGKey(0))
    if pathlib.Path(SNAP).exists():
        state = restore_train_state(tr, load_snapshot(SNAP))
        print(f"# restored trained snapshot (step {tr.host_step}) — "
              "realistic grid occupancy", flush=True)
    else:
        print("# no snapshot; profiling with the init grid", flush=True)
    return tr, state


def _variants(tr, state):
    """Build the nested step variants. Each returns a jitted
    (params, key) -> scalar scanning SCAN steps."""
    from synerfgine_tpu.march.composite import composite_rays
    from synerfgine_tpu.march.compacted import composite_compacted
    from synerfgine_tpu.march.dda import (
        compact_samples_segmented,
        march_rays_grid,
        scatter_back,
    )

    bitfield = state.grid.bitfield
    data = tr.data
    net = tr.network
    batch = tr.batch_size
    K = tr.n_march_steps
    aabb = tr.aabb

    def sample_and_march(key):
        k_rays, k_march, k_u = jax.random.split(key, 3)
        img_idx, uv, texel, _ = tr._sample_pixels(data, k_rays, R, None)
        rays = tr._rays_for(data, img_idx, uv)
        dirs_warped = (rays.d + 1.0) * 0.5
        samples = march_rays_grid(rays, aabb, tr.grid, bitfield,
                                  K, tr.cone_angle, k_march)
        comp_in = compact_samples_segmented(samples, dirs_warped, batch)
        xs_unit = jnp.clip(aabb.relative_pos(comp_in.xs), 0.0, 1.0)
        grad_u = jax.random.uniform(k_u, (net.pos_encoding.n_levels, batch))
        return samples, comp_in, xs_unit, grad_u, texel

    def loss_from_dense(dense, samples, comp_in, texel):
        comp = composite_rays(dense[..., :3], dense[..., 3],
                              samples.dt, samples.t, comp_in.valid, 1e-4)
        pred = comp.rgb + comp.transmittance[:, None]
        target = texel[:, :3] * texel[:, 3:] + (1.0 - texel[:, 3:])
        return jnp.mean(tr.loss_fn(pred, target))

    def v_march(params, key):
        samples, comp_in, xs_unit, _, _ = sample_and_march(key)
        return jnp.sum(xs_unit) + jnp.sum(comp_in.dt)

    def dense_loss(params, key, with_net, grad):
        samples, comp_in, xs_unit, grad_u, texel = sample_and_march(key)

        def loss_fn(p):
            if with_net:
                out = net.forward(p, xs_unit, comp_in.dirs,
                                  grad_u=grad_u if grad else None)
            else:
                # net stand-in with the same output arity, ~free
                out = jnp.concatenate(
                    [xs_unit, jnp.sum(xs_unit * p.hash_table[0, :3],
                                      -1, keepdims=True)], -1)
            dense = scatter_back(out, comp_in, R, K)
            return loss_from_dense(dense, samples, comp_in, texel)

        if grad:
            l, g = jax.value_and_grad(loss_fn)(params)
            return l + jax.tree.reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b)) * 0, g, 0.0)
        return loss_fn(params)

    def v_fb_seg(params, key, grad=True):
        samples, comp_in, xs_unit, grad_u, texel = sample_and_march(key)

        def loss_fn(p):
            out = net.forward(p, xs_unit, comp_in.dirs, grad_u=grad_u)
            comp = composite_compacted(out, comp_in, R, 1e-4)
            pred = comp.rgb + comp.transmittance[:, None]
            target = texel[:, :3] * texel[:, 3:] + (1.0 - texel[:, 3:])
            return jnp.mean(tr.loss_fn(pred, target))

        if grad:
            l, g = jax.value_and_grad(loss_fn)(params)
            return l + jax.tree.reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b)) * 0, g, 0.0)
        return loss_fn(params)

    def v_step(params_opt, key):
        params, opt_state = params_opt

        def one(carry, k):
            p, os = carry
            samples, comp_in, xs_unit, grad_u, texel = sample_and_march(k)

            def loss_fn(pp):
                out = net.forward(pp, xs_unit, comp_in.dirs, grad_u=grad_u)
                dense = scatter_back(out, comp_in, R, K)
                return loss_from_dense(dense, samples, comp_in, texel)

            l, g = jax.value_and_grad(loss_fn)(p)
            p, os = tr.opt.update(g, os, p)
            return (p, os), l

        (_, _), ls = jax.lax.scan(one, (params, opt_state),
                                  jax.random.split(key, SCAN))
        return jnp.sum(ls)

    def scanned(body):
        def run(params, key):
            def one(c, k):
                return c, body(params, k)

            _, outs = jax.lax.scan(one, 0.0, jax.random.split(key, SCAN))
            return jnp.sum(outs)

        return jax.jit(run)

    def v_fb_net(alt_net, params, key):
        """fb_seg with an alternate network (lattice / exact modes);
        same param pytree shapes, so tr's params are reused."""
        samples, comp_in, xs_unit, grad_u, texel = sample_and_march(key)

        def loss_fn(p):
            out = alt_net.forward(p, xs_unit, comp_in.dirs, grad_u=grad_u)
            comp = composite_compacted(out, comp_in, R, 1e-4)
            pred = comp.rgb + comp.transmittance[:, None]
            target = texel[:, :3] * texel[:, 3:] + (1.0 - texel[:, 3:])
            return jnp.mean(tr.loss_fn(pred, target))

        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)) * 0, g, 0.0)

    from synerfgine_tpu.nn.nerf_network import NerfNetwork

    def alt(hash_mode, hash_grad):
        return NerfNetwork(net.config, aabb_scale=tr.grid.aabb_scale,
                           hash_mode=hash_mode, hash_grad=hash_grad)

    variants = {
        "march": scanned(v_march),
        "dense_fwd": scanned(lambda p, k: dense_loss(p, k, False, False)),
        "dense_fb": scanned(lambda p, k: dense_loss(p, k, False, True)),
        "fwd": scanned(lambda p, k: dense_loss(p, k, True, False)),
        "fb": scanned(lambda p, k: dense_loss(p, k, True, True)),
        "fb_seg": scanned(v_fb_seg),
        # the round-3 contenders, same harness (fb_seg form):
        #   fbx      exact 8-corner backward, additive_x (chunked scatter)
        #   lat_fb   lattice full-cell fwd + stochastic backward
        #   lat_fbx  lattice fwd + lattice-exact backward (wide-row
        #            cell scatter + static rolls)
        "fbx": scanned(partial(v_fb_net, alt("additive_x", "exact"))),
        "lat_fb": scanned(partial(v_fb_net, alt("lattice", "stochastic"))),
        "lat_fbx": scanned(partial(v_fb_net, alt("lattice", "exact"))),
        "step": jax.jit(v_step),
    }
    return variants


def cmd_stages():
    tr, state = _setup()
    variants = _variants(tr, state)
    params = state.params
    key = jax.random.PRNGKey(42)
    results = {name: [] for name in variants}
    order = list(variants.items())
    print(f"# R={R} batch=2^18 K={tr.n_march_steps} scan={SCAN} "
          f"(times are ms/STEP)", flush=True)
    for rnd in range(3):
        for name, fn in order:
            if name == "step":
                args = ((params, state.opt_state), key)
            else:
                args = (params, key)
            try:
                ts = bench(fn, *args, iters=1, warmup=1 if rnd == 0 else 0)
                results[name].extend(t / SCAN for t in ts)
                print(f"round {rnd} {name:<10s} {ts[0]/SCAN:8.1f} ms/step",
                      flush=True)
            except Exception as e:  # keep going; partial data is useful
                print(f"round {rnd} {name}: FAILED {type(e).__name__} {e}",
                      flush=True)
            key = jax.random.fold_in(key, 1)
    print("\n# medians (ms/step)", flush=True)
    med = {n: float(np.median(v)) for n, v in results.items() if v}
    for n, v in med.items():
        print(f"{n:<10s} {v:8.1f}")
    if {"fb", "fwd", "dense_fb", "dense_fwd", "march"} <= med.keys():
        print("\n# attribution")
        print(f"march+compact        {med['march']:8.1f}")
        print(f"scatter_back+composite fwd {med['dense_fwd']-med['march']:8.1f}")
        print(f"  ... bwd              {med['dense_fb']-med['dense_fwd']:8.1f}")
        print(f"network fwd          {med['fwd']-med['dense_fwd']:8.1f}")
        print(f"network bwd          {(med['fb']-med['fwd'])-(med['dense_fb']-med['dense_fwd']):8.1f}")
        if "step" in med:
            print(f"optimizer            {med['step']-med['fb']:8.1f}")
        if "fb_seg" in med:
            print(f"fb_seg saves         {med['fb']-med['fb_seg']:8.1f}")
        for n in ("fbx", "lat_fb", "lat_fbx"):
            if n in med:
                print(f"{n} vs fb_seg       {med[n]-med['fb_seg']:8.1f}")


def cmd_gather64():
    """Is a 64 B-row gather still 1 transaction? Decides the quad-row
    hash layout (4 corners per gather)."""
    key = jax.random.PRNGKey(0)
    n = 1 << 21
    for width, rows in ((4, 1 << 21), (8, 1 << 20), (16, 1 << 19),
                        (32, 1 << 18)):
        tbl = jnp.zeros((rows, width), jnp.float32)
        idx = jax.random.randint(key, (n,), 0, rows)

        @jax.jit
        def g(tbl, idx):
            return tbl[idx].sum()

        ts = bench(g, tbl, idx, iters=3, warmup=1)
        print(f"gather 2M x {width*4:3d}B rows ({rows*width*4>>20:4d} MB "
              f"table): {np.median(ts):7.1f} ms", flush=True)


def cmd_scatterwide():
    """Price the lattice-exact backward's wide-row scatter: 2M updates of
    row width w into destinations of n rows (the <=4 MB rule measured in
    round 2 was for 16 B rows; the cell scatter writes 128 B rows into a
    64 MB destination)."""
    key = jax.random.PRNGKey(0)
    n_upd = 1 << 21
    for width, rows in ((4, 1 << 18), (32, 1 << 15), (32, 1 << 18),
                        (32, 1 << 19), (8, 1 << 19)):
        dest_mb = rows * width * 4 >> 20
        idx = jax.random.randint(key, (n_upd,), 0, rows)
        val = jnp.ones((n_upd, width), jnp.float32)

        @jax.jit
        def s(idx, val):
            return (jnp.zeros((rows, width), jnp.float32)
                    .at[idx].add(val).sum())

        ts = bench(s, idx, val, iters=3, warmup=1)
        print(f"scatter 2M x {width*4:3d}B rows -> {dest_mb:4d} MB dest: "
              f"{np.median(ts):7.1f} ms "
              f"({np.median(ts)*1e6/n_upd:5.1f} ns/update)", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "stages"
    {"stages": cmd_stages, "gather64": cmd_gather64,
     "scatterwide": cmd_scatterwide}[cmd]()
