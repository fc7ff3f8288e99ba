"""Round-4 serialized chip queue — runs after the headline ds1 ladder.

Stages (each probes the relay, runs in a subprocess with a timeout, and
skips itself when its artifact already exists — resumable):

  conefix   +512-step fixed-stepping resume of the cone-marched ladder
  evalchunk EVAL_CHUNK 4096-vs-16384 eval pricing (must precede ab so
            stage_ab's adoption gate has data)
  ab        ds1 512-step PSNR A/Bs: quadexact, exact, skipzero, quad,
            fp32mlp
  abperf    ds2+ds1 step-time A/Bs: marchskip, spanfit
  hybrid    720p/1080p hybrid frame sweep on the trained ds1 snapshot
  fox       fox scene ladder (big-aabb + OpenCV lens artifact)
  orbit     lego orbit frames from the ds1 snapshot
  trace     fresh jax.profiler trace of a steady train block
  mosaic    Pallas VMEM gather re-test (bounded; hang-safe)
  cache     persistent-compile-cache diagnosis
  bench     bench.py (writes the round JSON)

Usage: python scripts/r4_queue.py [stage ...]
SUPERSEDED in round 5 by scripts/r5_queue.py (kept for the artifact
trail; the default stage list now includes every registered stage in
dependency order — ADVICE r4 #1).
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
DOCS = REPO / "docs"
EXP = DOCS / "experiments"
SNAP = pathlib.Path("/tmp/milestone_r4/lego_ds1/model.sng")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(timeout_s=150):
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.ones(3).sum()))"],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_device():
    while not probe():
        log("relay down; waiting 120 s")
        time.sleep(120)


def run(args, timeout_s, out_file=None, env=None):
    import os

    e = dict(os.environ)
    if env:
        e.update(env)
    log("+", " ".join(map(str, args)))
    try:
        r = subprocess.run([sys.executable] + [str(a) for a in args],
                           capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO, env=e)
    except subprocess.TimeoutExpired:
        log("TIMEOUT")
        return None
    sys.stderr.write((r.stderr or "")[-1500:])
    lines = [l for l in (r.stdout or "").splitlines() if l.startswith("{")]
    if out_file and lines:
        pathlib.Path(out_file).write_text("\n".join(lines) + "\n")
    if not lines:
        sys.stderr.write((r.stdout or "")[-800:])
    return lines


def stage_ab():
    # QUALITY set at ds1-512: the 1024-step ladder renders show
    # pervasive high-frequency grain (gradient variance); the prime
    # suspect is the stochastic single-corner hash backward, whose r3
    # exoneration was at ds2 pre-fill/pre-cone. Base = the ladder's own
    # 512 rung (identical config), so only the 3 variants run.
    env = {}
    ecj = EXP / "evalchunk_r4.json"
    if ecj.exists():
        # adopt the 16384-px eval chunk for the ds1 evals when the
        # pricing stage showed it faster at unchanged PSNR
        rows = {r["eval_chunk"]: r for r in json.loads(ecj.read_text())}
        a, b = rows.get(4096), rows.get(16384)
        if (a and b and b["render_s_steady"] < 0.9 * a["render_s_steady"]
                and abs(b["psnr_mean"] - a["psnr_mean"]) < 0.05):
            env["EVAL_CHUNK"] = "16384"
            log("ab: adopting EVAL_CHUNK=16384 "
                f"({b['render_s_steady']}s vs {a['render_s_steady']}s/view)")
    wait_device()
    run(["scripts/exp_ab.py",
         "--only", "quadexact,exact,skipzero,quad,fp32mlp",
         "--steps", "512", "--downscale", "1",
         "--eval-at", "512", "--eval-views", "4",
         "--budget-s", "8000", "--out", str(EXP / "ab_r4")], 14000,
        env=env or None)


def stage_ab_perf():
    # THROUGHPUT set at ds2: with cone stepping the K=1024 dense march
    # dominates step time, so the march-shorteners are the top levers —
    # marchskip (skip-grid pre-pass) and spanfit (camera-span clamp,
    # sample-set-equal). base gives the same-session step-time
    # reference; PSNR @512 sanity-checks neutrality (quad's real
    # quality read runs in the ds1 set).
    wait_device()
    run(["scripts/exp_ab.py",
         "--only", "base,marchskip,spanfit",
         "--steps", "512", "--downscale", "2",
         "--eval-at", "256,512", "--eval-views", "4",
         "--budget-s", "3600", "--out", str(EXP / "ab_r4")], 8000)
    # ds1 step-TIME pair (no evals — eval-at beyond steps). Under the
    # reference cone rule (0 for aabb<=1) spanfit's stepping-space
    # bound exceeds K=1024 for lego's equatorial cameras (no-op), so
    # the march-shortener that still bites is --march-skip 768 (the
    # skip-grid pre-pass removes the leading empty space; PSNR
    # neutrality sanity-checked by the ds2 rungs above).
    wait_device()
    run(["scripts/exp_ab.py",
         "--only", "base,marchskip",
         "--steps", "256", "--downscale", "1",
         "--eval-at", "100000", "--eval-views", "1",
         "--budget-s", "1600", "--out", str(EXP / "ab_r4_ds1t")], 3600)


def stage_conefix():
    # The r4 headline ladder cone-marched lego (0bbfba6) — a deviation
    # from the reference rule (testbed_nerf.cu:3083-3085: cone 0 for
    # aabb_scale <= 1, exponential stepping only in larger scenes) that
    # regressed the 2048 rung (25.36 -> 24.51 dB with fog bloom: ~9x
    # coarser dt at the object caps the converged model). HEAD reverts
    # to the per-dataset rule; this stage confirms on chip by resuming
    # the ladder's final model under fixed fine stepping for +512 steps
    # and re-evaluating the same 4 held-out views.
    out = DOCS / "milestone_lego_r4" / "conefix_progress.json"
    if out.exists():
        log("conefix: already done")
        return
    src = SNAP.parent
    if not (src / "progress.json").exists():
        log("conefix: no ladder")
        return
    dst = pathlib.Path("/tmp/milestone_r4fix/lego_ds1")
    dst.mkdir(parents=True, exist_ok=True)
    prog = json.loads((src / "progress.json").read_text())
    steps = int(prog["steps"])
    if not (dst / "progress.json").exists():
        prog["evals"] = []
        prog["note"] = ("resume of the cone-marched ladder under the "
                        "reference cone rule (0 for aabb_scale<=1)")
        (dst / "progress.json").write_text(json.dumps(prog))
        (dst / "model.sng").write_bytes((src / "model.sng").read_bytes())
    wait_device()
    run(["scripts/milestone.py",
         "--scene", "/root/reference/data/nerf/lego",
         "--downscale", "1", "--target-steps", str(steps + 512),
         "--chunk-steps", "256", "--eval-at", str(steps + 512),
         "--eval-views", "4", "--budget-s", "2400",
         "--dir", "/tmp/milestone_r4fix"], 4200)
    p = dst / "progress.json"
    if p.exists() and json.loads(p.read_text()).get("evals"):
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(p.read_text())
        for rd in sorted(dst.glob("renders_*")):
            f = rd / "render_000.png"
            if f.exists():
                (out.parent / f"conefix_{rd.name}_render_000.png"
                 ).write_bytes(f.read_bytes())
        log("conefix banked")


def stage_hybrid():
    import os

    if (EXP / "hybrid_sweep.json").exists() and json.loads(
            (EXP / "hybrid_sweep.json").read_text()):
        log("hybrid: already done")
        return
    if not SNAP.exists():
        log("hybrid: no snapshot")
        return
    EXP.mkdir(parents=True, exist_ok=True)
    rows = []
    for H, W, sweep in ((720, 1280, "1"), (1080, 1920, "")):
        wait_device()
        lines = run(["scripts/exp_hybrid.py"], 3000,
                    env={"HYBRID_SNAPSHOT": str(SNAP), "HYBRID_W": str(W),
                         "HYBRID_H": str(H), "HYBRID_SWEEP": sweep})
        for ln in lines or []:
            rows.append(json.loads(ln))
            log(ln)
    if rows:
        (EXP / "hybrid_sweep.json").write_text(json.dumps(rows, indent=2))
        log("hybrid sweep banked")


def stage_fox():
    d = DOCS / "milestone_fox"
    if (d / "progress.json").exists() and json.loads(
            (d / "progress.json").read_text()).get("evals"):
        log("fox: already done")
        return
    wait_device()
    run(["scripts/milestone.py", "--scene", "/root/reference/data/nerf/fox",
         "--downscale", "4", "--target-steps", "1024",
         "--chunk-steps", "256", "--eval-at", "512,1024",
         "--eval-views", "4", "--budget-s", "1500",
         "--dir", "/tmp/milestone_fox"], 4800)
    src = pathlib.Path("/tmp/milestone_fox/fox_ds4")
    if (src / "progress.json").exists():
        d.mkdir(parents=True, exist_ok=True)
        (d / "progress.json").write_text((src / "progress.json").read_text())
        for rd in sorted(src.glob("renders_*")):
            for f in (sorted(rd.glob("render_00[01].png"))
                      + sorted(rd.glob("gt_000.png"))):
                (d / f"{rd.name}_{f.name}").write_bytes(f.read_bytes())
        log("fox artifacts banked")


def stage_orbit(n_frames=24):
    d = DOCS / "demo_frames" / "lego_orbit_r4"
    if d.exists() and len(list(d.glob("*.png"))) >= n_frames:
        log("orbit: already done")
        return
    if not SNAP.exists():
        log("orbit: no snapshot")
        return
    wait_device()
    run(["scripts/make_demo_path.py", "/tmp/orbit_path.json"], 300)
    run(["-m", "synerfgine_tpu.cli.main", "render",
         "--scene", "/root/reference/data/nerf/lego",
         "--load-snapshot", str(SNAP),
         "--camera-path", "/tmp/orbit_path.json",
         "--n-frames", str(n_frames), "--width", "400", "--height", "400",
         "--out", str(d)], 3000)


def stage_trace():
    d = DOCS / "profiles" / "r4_trace"
    if d.exists() and any(d.rglob("*.json.gz")):
        log("trace: already done")
        return
    wait_device()
    run(["-m", "synerfgine_tpu.cli.main", "train",
         "--scene", "/root/reference/data/nerf/lego", "--downscale", "2",
         "--n-steps", "16", "--profile", str(d)]
        + (["--load-snapshot", str(SNAP)] if SNAP.exists() else []), 2400)
    gz = sorted(d.rglob("*.trace.json.gz"))
    if gz:
        run(["scripts/trace_topops.py", gz[-1], d / "TOP_OPS_DEVICE.txt"],
            600)


def stage_evalchunk():
    # price the eval dispatch overhead: same view, EVAL_CHUNK 4096 vs
    # 16384 (157 vs 40 dispatches at 800x800 spp 8). Steady per-view
    # seconds land in each JSON line's render_s_steady; adoption gate
    # for changing the default eval chunk shape.
    if not SNAP.exists():
        log("evalchunk: no snapshot")
        return
    out = []
    for ch in ("4096", "16384"):
        wait_device()
        lines = run(["-m", "synerfgine_tpu.cli.main", "eval",
                     "--scene", "/root/reference/data/nerf/lego",
                     "--load-snapshot", str(SNAP), "--n-views", "2"],
                    2400, env={"EVAL_CHUNK": ch})
        for ln in lines or []:
            row = json.loads(ln)
            row["eval_chunk"] = int(ch)
            out.append(row)
            log(ln)
    if out:
        (EXP / "evalchunk_r4.json").write_text(json.dumps(out, indent=2))


def stage_mosaic():
    wait_device()
    run(["scripts/exp_mosaic_gather.py"], 900,
        out_file=EXP / "mosaic_gather_r4.json")


def stage_cache():
    wait_device()
    run(["scripts/exp_cache_diag.py"], 2400,
        out_file=EXP / "cache_diag_r4.json")


def stage_bench():
    wait_device()
    run(["bench.py"], 3000, out_file=EXP / "bench_preview_r4.json")


STAGES = {"conefix": stage_conefix, "ab": stage_ab, "abperf": stage_ab_perf, "hybrid": stage_hybrid,
          "fox": stage_fox, "orbit": stage_orbit, "trace": stage_trace,
          "evalchunk": stage_evalchunk, "mosaic": stage_mosaic,
          "cache": stage_cache, "bench": stage_bench}

if __name__ == "__main__":
    names = sys.argv[1:] or ["conefix", "evalchunk", "ab", "abperf",
                             "hybrid", "fox", "orbit", "trace", "mosaic",
                             "cache", "bench"]
    for s in names:
        log(f"=== stage {s} ===")
        STAGES[s]()
    log("queue done")
