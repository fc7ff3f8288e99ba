"""Hybrid frame timing on the real TPU (PERF.md round-2 target #5).

Times Engine.frame() at 1280x720 with the armadillo virtual scene over a
synthetic trained state (random params, ~8% occupancy grid — marching
cost is representative of a converged scene). Mirrors the reference's
nvprof sweeps (docs/assets_sng/profiling: 1280x720, shadow samples
{1..8}^2). Emits one JSON line per configuration.
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SCENE = "/root/reference/scripts/virtual_desc/armadillo.json"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.grid.occupancy import OccupancyGrid
    from synerfgine_tpu.hybrid.engine import Engine
    from synerfgine_tpu.hybrid.scene import load_scene_json
    from synerfgine_tpu.nn.nerf_network import NerfNetwork

    log("devices:", jax.devices())
    cfg = NGPNetworkConfig.from_json("/root/reference/configs/nerf/base.json")
    net = NerfNetwork(cfg, aabb_scale=1)

    snap_path = os.environ.get("HYBRID_SNAPSHOT",
                               "/tmp/milestone/lego_ds1/model.sng")
    grid = OccupancyGrid(1)
    if pathlib.Path(snap_path).exists():
        # REAL trained lego state: representative march + shadow-DDA cost
        from synerfgine_tpu.io.snapshot import load_snapshot

        snap = load_snapshot(snap_path, hash_version=None)
        hv_mode = {1: "xor", 2: "additive_x", 3: "lattice", 4: "quad"}
        net = NerfNetwork(cfg, aabb_scale=1,
                          hash_mode=hv_mode.get(snap["hash_version"],
                                                "additive_x"))
        ref = net.init(jax.random.PRNGKey(0))
        params = jax.tree.unflatten(
            jax.tree.structure(ref),
            [jnp.asarray(a) for a in snap["params"]])
        gstate = grid.init()._replace(
            density=jnp.asarray(snap["density_grid"]))
        gstate = grid.finalize(gstate)
        occ_pct = float(jnp.mean(gstate.bitfield[0])) * 100
        log(f"trained snapshot {snap_path} (step {snap['step']}, "
            f"occupancy {occ_pct:.1f}%)")
    else:
        params = net.init(jax.random.PRNGKey(0))
        gstate = grid.init()
        rng = np.random.default_rng(0)
        occ = rng.uniform(size=np.asarray(gstate.density).shape) < 0.08
        gstate = gstate._replace(
            density=jnp.asarray(np.where(occ, 1.0, 0.0).astype(np.float32)),
            bitfield=jnp.asarray(occ))
        log("no trained snapshot; synthetic 8% grid")

    W = int(os.environ.get("HYBRID_W", "1280"))
    H = int(os.environ.get("HYBRID_H", "720"))
    # shadow-sample sweep (syn, nerf) — diagonal of the reference's
    # {1,2,4,8}^2 nvprof grid (profiling.sh --sshadows/--nshadows);
    # each config is one compiled program, so the sweep stays inside the
    # relay's sustained-load budget
    sweep = os.environ.get("HYBRID_SWEEP", "")
    configs = ([(s, s) for s in (1, 2, 4, 8)] if sweep else [(None, None)])
    reps = int(os.environ.get("HYBRID_REPS", "8"))
    out_path = os.environ.get("HYBRID_OUT", "")

    from synerfgine_tpu.io.image import write_image

    art = pathlib.Path(__file__).resolve().parents[1] / "docs"
    art.mkdir(exist_ok=True)
    for ss, ns in configs:
        scene = load_scene_json(SCENE)
        if ss is not None:
            scene.settings.syn_shadow_samples = ss
            scene.settings.shadow_samples = ss
            scene.settings.nerf_shadow_samples = ns
        eng = Engine(net, params, grid, gstate, scene, width=W, height=H)
        if ss is None:
            log(f"nerf_res {eng.nerf_res} syn_res {eng.syn_res}")

        t0 = time.time()
        out = eng.frame()
        np.asarray(out["rgb"])
        log(f"[s{ss}n{ns}] first frame (compile) {time.time()-t0:.1f}s")

        t0 = time.time()
        for _ in range(reps):
            out = eng.frame()
            np.asarray(out["rgb"])   # host fetch paces the relay
        dt = (time.time() - t0) / reps * 1000
        rec = {
            "metric": f"hybrid_frame_ms_{H}p", "value": round(dt, 1),
            "unit": "ms", "syn_shadow_samples": ss, "nerf_shadow_samples": ns,
            "reps": reps,
            "timings": {k: round(v * 1000, 1) for k, v
                        in eng.timings.items()}}
        print(json.dumps(rec), flush=True)
        if out_path:
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
    rgb = np.clip(np.asarray(out["rgb"]), 0, 1)
    write_image(str(art / f"hybrid_frame_{H}p.png"), rgb)
    log(f"frame artifact: docs/hybrid_frame_{H}p.png")


if __name__ == "__main__":
    main()
