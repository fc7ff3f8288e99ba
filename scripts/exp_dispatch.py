"""Dispatch-granularity experiment (PERF.md round-2 target #1).

Question: components of a train step sum to ~300 ms, but the 16-step
scan-fused block measures 1-3.5 s/step through the remote-TPU relay.
Is the scan itself slow, or is per-dispatch overhead / worker throttling
to blame?  Times, in one process (one TPU client at a time):

  A. 16 x single-step dispatch (trainer._step), paced by the loss fetch;
  B. 1 x scan(16) block;
  C. 8 x scan(2) blocks;
  D. 4 x scan(4) blocks.

Each timing is a short window (relay worker tolerates only minutes of
sustained load). Emits one JSON line per variant on stdout.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

LEGO = "/root/reference/data/nerf/lego"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.data import load_nerf_dataset
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    log("devices:", jax.devices())
    ds = load_nerf_dataset(LEGO, downscale=2)
    cfg = NGPNetworkConfig.from_json("/root/reference/configs/nerf/base.json")
    net = NerfNetwork(cfg, aabb_scale=ds.aabb_scale)
    trainer = NerfTrainer(net, ds, n_rays=4096, batch_size=1 << 18,
                          use_grid=True, grid_warmup_steps=0)
    state = trainer.init(jax.random.PRNGKey(1337))
    # settle the grid with a few fused blocks first (also compiles scan(16))
    t0 = time.time()
    state, _ = trainer.train(state, 32, adaptive_rays=False)
    log(f"warmup 32 steps (scan16 compile) in {time.time()-t0:.1f}s")

    results = []

    def report(name, n_steps, dt):
        ms = dt / n_steps * 1000
        log(f"{name}: {n_steps} steps in {dt:.2f}s = {ms:.0f} ms/step")
        results.append({"variant": name, "ms_per_step": round(ms, 1)})
        print(json.dumps(results[-1]), flush=True)

    # --- A: single-step dispatches (loss fetch paces every step)
    state, loss, _ = trainer._step(state, None, trainer.data)  # compile
    float(loss)
    t0 = time.time()
    for _ in range(16):
        state, loss, _ = trainer._step(state, None, trainer.data)
        float(loss)
    report("single_step_x16", 16, time.time() - t0)

    # --- B: one scan(16) block, already compiled by warmup
    t0 = time.time()
    state, ls, _ = trainer._scan_steps(state, trainer.data, 16, False, None)
    float(ls[-1])
    report("scan16_x1", 16, time.time() - t0)

    # --- C: scan(2) blocks
    state, ls, _ = trainer._scan_steps(state, trainer.data, 2, False, None)
    float(ls[-1])  # compile
    t0 = time.time()
    for _ in range(8):
        state, ls, _ = trainer._scan_steps(state, trainer.data, 2, False, None)
        float(ls[-1])
    report("scan2_x8", 16, time.time() - t0)

    # --- D: scan(4) blocks
    state, ls, _ = trainer._scan_steps(state, trainer.data, 4, False, None)
    float(ls[-1])  # compile
    t0 = time.time()
    for _ in range(4):
        state, ls, _ = trainer._scan_steps(state, trainer.data, 4, False, None)
        float(ls[-1])
    report("scan4_x4", 16, time.time() - t0)

    # --- B again: is the worker now throttled (order effect)?
    t0 = time.time()
    state, ls, _ = trainer._scan_steps(state, trainer.data, 16, False, None)
    float(ls[-1])
    report("scan16_x1_again", 16, time.time() - t0)

    # --- A again
    t0 = time.time()
    for _ in range(16):
        state, loss, _ = trainer._step(state, None, trainer.data)
        float(loss)
    report("single_step_x16_again", 16, time.time() - t0)

    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    main()
