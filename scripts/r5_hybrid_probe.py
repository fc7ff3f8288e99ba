"""Binary-search the hybrid tracer's on-chip failure (round-5, VERDICT #1).

Each invocation runs ONE named stage as its own process (a crashed TPU
worker poisons the client), dispatches the sub-program on the real chip,
and appends a JSON line {stage, ok, ms, err} to HYBRID_PROBE_OUT
(default /tmp/hybrid_probe.jsonl).

Stages build up the tracer program piece by piece over the armadillo
world (995 tris, BVH-routed):
  brute    dense ray x tri intersection, 4096 rays, 128 tris
  bvh      bvh_traverse, 4096 rays
  ladder   nerf_occlusion_depth (64-step occupancy ladder), 4096 rays
  shade1   _shade scan with shadow_samples=1
  shade8   _shade scan with shadow_samples=8
  trace111 _trace_impl samples=1 bounces=1 shadow_samples=1
  trace888 full armadillo settings (8/2/8)
  chunk64k trace888 at 65536 rays (the engine chunk size)
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = os.environ.get("HYBRID_PROBE_OUT", "/tmp/hybrid_probe.jsonl")
SCENE = "/root/reference/scripts/virtual_desc/armadillo.json"


def main(stage: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from synerfgine_tpu.grid.occupancy import OccupancyGrid
    from synerfgine_tpu.hybrid.raytracer import RayTracer
    from synerfgine_tpu.hybrid.scene import load_scene_json
    from synerfgine_tpu.train.nerf_trainer import scene_aabb

    scene = load_scene_json(SCENE)
    world = scene.pack_device()
    grid = OccupancyGrid(1)
    gstate = grid.init()
    rng = np.random.default_rng(0)
    occ = rng.uniform(size=np.asarray(gstate.density).shape) < 0.08
    gstate = gstate._replace(
        density=jnp.asarray(np.where(occ, 1.0, 0.0).astype(np.float32)),
        bitfield=jnp.asarray(occ))
    aabb = scene_aabb(1)

    R = {"chunk8k": 8192, "chunk16k": 16384, "chunk32k": 32768,
         "chunk64k": 65536, "bf8k": 8192, "bf16k": 16384}.get(stage, 4096)
    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.asarray([[0.5, 0.5, -2.0]]), (R, 1))
    th = jnp.linspace(0, 0.5, R)
    d = jnp.stack([jnp.sin(th) * 0.3, jnp.cos(th) * 0.1,
                   jnp.ones(R)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def tracer(**kw):
        a = dict(samples=2, bounces=2, shadow_samples=2)
        a.update(kw)
        return RayTracer(grid, aabb, **a)

    t0 = time.time()
    if stage in ("qbrute", "qladder"):
        # steady-state per-query cost at 8192 rays (compile excluded)
        R = 8192
        o8 = jnp.tile(o[:1], (R, 1))
        th8 = jnp.linspace(0, 0.5, R)
        d8 = jnp.stack([jnp.sin(th8) * 0.3, jnp.cos(th8) * 0.1,
                        jnp.ones(R)], -1)
        d8 = d8 / jnp.linalg.norm(d8, axis=-1, keepdims=True)
        if stage == "qbrute":
            from synerfgine_tpu.geometry.triangle import \
                ray_triangles_intersect
            fn = jax.jit(lambda o, d: ray_triangles_intersect(
                o, d, world["tris"])[0])
        else:
            tr = tracer()
            fn = jax.jit(lambda o, d: tr.nerf_occlusion_depth(
                o, d, gstate.bitfield, jnp.full(R, 3.0)))
        fn(o8, d8).block_until_ready()
        t1 = time.time()
        for i in range(10):
            fn(o8 + i * 1e-6, d8).block_until_ready()
        steady = (time.time() - t1) / 10 * 1000
        with open(OUT, "a") as f:
            f.write(json.dumps({"stage": stage, "ok": True, "R": R,
                                "steady_ms": round(steady, 2)}) + "\n")
        print(f"{stage} ok steady {steady:.2f} ms/query @8192")
        return
    if stage == "brute":
        from synerfgine_tpu.geometry.triangle import ray_triangles_intersect
        t, tri, _, _ = jax.jit(ray_triangles_intersect)(
            o, d, world["tris"][:128])
        t.block_until_ready()
    elif stage == "bvh":
        # build nodes explicitly: pack_device only carries bvh_* above
        # BRUTE_FORCE_MAX_TRIS, and armadillo (995) is brute-routed
        # since the round-5 threshold revert
        from synerfgine_tpu.geometry.bvh import TriangleBvh, bvh_traverse
        bvh = TriangleBvh(np.asarray(world["tris"]))
        nodes = {"lo": bvh.bounds_lo, "hi": bvh.bounds_hi,
                 "left": bvh.left, "right": bvh.right,
                 "first": bvh.first, "count": bvh.count, "tris": bvh.tris}
        t, tri, _, _ = jax.jit(bvh_traverse)(nodes, o, d)
        t.block_until_ready()
    elif stage == "ladder":
        tr = tracer()
        out = jax.jit(lambda o, d, bf: tr.nerf_occlusion_depth(
            o, d, bf, jnp.full(o.shape[0], 3.0)))(o, d, gstate.bitfield)
        out.block_until_ready()
    elif stage in ("shade1", "shade8"):
        tr = tracer(shadow_samples=1 if stage == "shade1" else 8)
        hit = jnp.ones(R, bool)
        pos = o + d * 1.0
        nrm = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (R, 1))
        mat = jnp.zeros(R, jnp.int32)
        c, _ = jax.jit(lambda *a: tr._shade(*a))(
            d, hit, pos, nrm, mat, world, gstate.bitfield, key)
        c.block_until_ready()
    elif stage == "trace111":
        tr = tracer(samples=1, bounces=1, shadow_samples=1)
        out = tr.trace(type("Ray", (), {"o": o, "d": d}), world,
                       gstate.bitfield, key)
        out.rgb.block_until_ready()
    elif stage in ("trace888", "chunk8k", "chunk16k", "chunk32k",
                   "chunk64k", "trace888bf", "bf8k", "bf16k"):
        if stage.startswith("bf") or stage.endswith("bf"):
            # strip any BVH arrays -> brute-force routing. NOTE: since
            # the BRUTE_FORCE_MAX_TRIS 512->4096 revert, pack_device no
            # longer BVH-routes armadillo, so trace888 == trace888bf on
            # this scene; to measure the BVH trace path add bvh_* nodes
            # built as in the 'bvh' stage.
            world = {k: v for k, v in world.items()
                     if not k.startswith("bvh_")}
        tr = tracer(samples=8, bounces=2, shadow_samples=8)
        out = tr.trace(type("Ray", (), {"o": o, "d": d}), world,
                       gstate.bitfield, key)
        out.rgb.block_until_ready()
        t1 = time.time()
        out = tr.trace(type("Ray", (), {"o": o, "d": d}), world,
                       gstate.bitfield, jax.random.PRNGKey(1))
        out.rgb.block_until_ready()
        steady = (time.time() - t1) * 1000
        ms = (time.time() - t0) * 1000
        with open(OUT, "a") as f:
            f.write(json.dumps({"stage": stage, "ok": True, "R": R,
                                "ms": round(ms, 1),
                                "steady_ms": round(steady, 1)}) + "\n")
        print(f"{stage} ok {ms:.0f} ms (steady {steady:.0f} ms)")
        return
    else:
        raise SystemExit(f"unknown stage {stage}")
    ms = (time.time() - t0) * 1000
    with open(OUT, "a") as f:
        f.write(json.dumps({"stage": stage, "ok": True, "R": R,
                            "ms": round(ms, 1)}) + "\n")
    print(f"{stage} ok {ms:.0f} ms")


if __name__ == "__main__":
    stage = sys.argv[1]
    try:
        main(stage)
    except BaseException as e:  # record the failure shape, then re-raise
        with open(OUT, "a") as f:
            f.write(json.dumps({"stage": stage, "ok": False,
                                "err": f"{type(e).__name__}: {e}"[:300]})
                    + "\n")
        raise
