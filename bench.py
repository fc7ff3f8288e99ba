"""Round benchmark: NGP NeRF training throughput on the real chip.

Prints ONE JSON line:
  {"metric": "train_samples_per_s", "value": N, "unit": "samples/s",
   "vs_baseline": R}

Baseline: instant-ngp on an RTX-3090-class GPU trains its default
2^18-sample batch in roughly 10 ms (the 'fox in 5 seconds' regime,
BASELINE.md) => ~2.6e7 samples/s. vs_baseline = value / 2.6e7.
"""
from __future__ import annotations

import json
import sys
import time

BASELINE_SAMPLES_PER_S = 2.6e7
LEGO = "/root/reference/data/nerf/lego"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import pathlib

    import numpy as np

    from synerfgine_tpu.core.config import NGPNetworkConfig
    from synerfgine_tpu.nn.nerf_network import NerfNetwork
    from synerfgine_tpu.train.nerf_trainer import NerfTrainer

    log("devices:", jax.devices())

    if pathlib.Path(LEGO).exists():
        from synerfgine_tpu.data import load_nerf_dataset

        ds = load_nerf_dataset(LEGO, downscale=2)
        cfg_path = "/root/reference/configs/nerf/base.json"
        cfg = (NGPNetworkConfig.from_json(cfg_path)
               if pathlib.Path(cfg_path).exists() else NGPNetworkConfig())
    else:
        from __graft_entry__ import _tiny_synthetic_dataset

        ds = _tiny_synthetic_dataset(8, 128)
        cfg = NGPNetworkConfig()

    net = NerfNetwork(cfg, aabb_scale=ds.aabb_scale)
    batch_size = 1 << 18
    trainer = NerfTrainer(net, ds, n_rays=4096, batch_size=batch_size,
                          use_grid=True)
    # when more than one chip is visible, bench the data-parallel mesh
    # (the product multi-chip path, dist/sharded.py)
    n_devices = len(jax.devices())
    if n_devices > 1:
        from synerfgine_tpu.dist import ShardedNerfTrainer, make_mesh

        sharded = ShardedNerfTrainer(trainer, make_mesh())
        log(f"benching {n_devices}-device data-parallel mesh")
        state = sharded.init(jax.random.PRNGKey(1337))
    else:
        state = trainer.init(jax.random.PRNGKey(1337))

    # warmup PAST the grid-warmup boundary (steps < 256 fuse a full grid
    # update into every scanned step and pin the ray count — that regime
    # is ~2.4x slower than steady state and not what the reference's
    # samples/s measures). Then settle the adaptive ray bucket with one
    # steady-state block. train() host-syncs once per scan block
    # (block_until_ready is unreliable through the remote-TPU relay;
    # unsynced loops crash the worker by flooding its queue).
    t0 = time.time()
    state, _ = trainer.train(state, 256, adaptive_rays=True,
                             log_every=64, log_fn=log)
    state, _ = trainer.train(state, 32, adaptive_rays=True)
    log(f"warmup 256+32 steps in {time.time()-t0:.1f}s")

    # honest accounting (VERDICT r2 Weak #5): count the MEASURED
    # compacted samples the trainer reports, not batch_size x steps —
    # nothing guarantees the batch is full. Rays counted per block too.
    class _Acc:
        def __init__(self, start_step):
            self.prev = start_step
            self.samples = 0.0
            self.rays = 0.0

        def log(self, step, **kw):
            n = step - self.prev
            self.prev = step
            self.samples += n * kw.get("measured_samples", 0.0)
            self.rays += n * kw.get("rays_per_batch", 0)

    # short measurement: the remote TPU worker tolerates only a few
    # minutes of sustained load before being recycled
    n_steps = 48
    acc = _Acc(trainer.host_step)
    t0 = time.time()
    state, _ = trainer.train(state, n_steps, adaptive_rays=True,
                             log_every=16, log_fn=log, metrics=acc)
    dt = time.time() - t0
    samples_per_s = acc.samples / dt
    rays_per_s = acc.rays / dt
    log(f"{n_steps} steps in {dt:.2f}s = {n_steps/dt:.2f} steps/s; "
        f"measured {acc.samples/n_steps:.0f} samples/step "
        f"({100*acc.samples/(n_steps*batch_size):.1f}% of batch), "
        f"{rays_per_s:.0f} rays/s")

    # render phase (VERDICT r3 Next #6): trained-grid frame throughput at
    # the reference's eval raster (800x800). First call compiles; the
    # steady frame is the second call. spp 8 is the eval protocol; spp 1
    # is the interactive regime.
    render = {}
    try:
        import numpy as _np

        cam0 = _np.asarray(trainer.xforms[0])
        infer = trainer.inference_params(state)
        # chunk 16384: priced on chip in round 5 — 26% faster per view
        # than 4096 at identical PSNR (docs/experiments/
        # evalchunk_r5.json); also amortizes the relay's ~27 ms
        # per-dispatch floor over 40 dispatches at 800x800
        for spp in (1, 8):
            trainer.render_image(infer, cam0, width=800, height=800,
                                 grid_state=state.grid, spp=spp,
                                 chunk=16384)
            t0 = time.time()
            trainer.render_image(infer, cam0, width=800, height=800,
                                 grid_state=state.grid, spp=spp,
                                 chunk=16384)
            frame_s = time.time() - t0
            render[f"render_ms_spp{spp}"] = round(frame_s * 1e3, 1)
            render[f"render_fps_spp{spp}"] = round(1.0 / frame_s, 2)
            log(f"render 800x800 spp{spp}: {frame_s*1e3:.0f} ms/frame")
    except Exception as e:  # render must never sink the train metric
        log(f"render phase failed: {e!r}")
        render = {"render_error": str(e)[:200]}

    print(json.dumps({
        "metric": "train_samples_per_s",
        "value": round(samples_per_s),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 4),
        "rays_per_s": round(rays_per_s),
        "batch_fill": round(acc.samples / (n_steps * batch_size), 4),
        "step_ms": round(1e3 * dt / n_steps, 1),
        "accounting": "measured_compacted_samples",
        "n_devices": n_devices,
        **render,
    }))


def _probe_device(timeout_s: int = 150) -> bool:
    """Cheap liveness check in a subprocess (a dead relay hangs forever)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.ones(3).sum()))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_with_retries(max_tries: int = 3):
    """The remote TPU worker occasionally crashes under sustained load;
    a fresh process reconnects cleanly, so retry in subprocesses."""
    import subprocess

    for attempt in range(max_tries):
        # wait (bounded) for the device to come back before burning an
        # attempt on a hung init
        for _ in range(8):
            if _probe_device():
                break
            log("device unreachable; waiting 120 s")
            time.sleep(120)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--inner"],
                capture_output=True, text=True, timeout=2400,
            )
        except subprocess.TimeoutExpired:
            log(f"bench attempt {attempt+1} timed out; retrying")
            continue
        sys.stderr.write(r.stderr)
        lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if r.returncode == 0 and lines:
            print(lines[-1])
            return 0
        log(f"bench attempt {attempt+1} failed (rc={r.returncode}); retrying")
        time.sleep(20)
    # last resort: emit a null measurement rather than nothing
    print(json.dumps({"metric": "train_samples_per_s", "value": 0,
                      "unit": "samples/s", "vs_baseline": 0.0,
                      "error": "bench failed after retries"}))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(_run_with_retries())
