"""Chip smoke test for the exact-count batch fill (round 4).

Trains lego ds2 for ~320 steps and prints per-block batch fill +
step time so the exact measured-count adaptation can be verified on
chip in minutes before committing to a multi-hour ladder.
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


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
    ds = load_nerf_dataset("/root/reference/data/nerf/lego", downscale=2)
    cfg = NGPNetworkConfig.from_json("/root/reference/configs/nerf/base.json")
    net = NerfNetwork(cfg, aabb_scale=ds.aabb_scale)
    trainer = NerfTrainer(net, ds, n_rays=4096, batch_size=1 << 18,
                          use_grid=True)
    state = trainer.init(jax.random.PRNGKey(1337))

    class M:
        def __init__(self):
            self.t0 = time.time()
            self.prev_step = 0

        def log(self, step, **kw):
            now = time.time()
            n = step - self.prev_step
            fill = kw.get("measured_samples", 0.0) / trainer.batch_size
            log(f"step {step}: fill {fill:.3f} rays {kw.get('rays_per_batch')}"
                f" spr {kw.get('samples_per_ray', 0):.1f}"
                f" block {1e3*(now-self.t0)/max(n,1):.0f} ms/step")
            self.t0 = now
            self.prev_step = step

    t0 = time.time()
    state, _ = trainer.train(state, 256, adaptive_rays=True, metrics=M())
    log(f"warmup 256 in {time.time()-t0:.1f}s")
    m = M()
    m.prev_step = trainer.host_step
    t0 = time.time()
    state, _ = trainer.train(state, 96, adaptive_rays=True, metrics=m)
    dt = time.time() - t0
    log(f"steady 96 steps in {dt:.1f}s = {1e3*dt/96:.0f} ms/step")


if __name__ == "__main__":
    main()
