"""Round-3 artifact ladder (serialized chip jobs, resumable):

1. fox: train + held-out eval + render artifact (big-aabb + OpenCV lens)
2. lego orbit: camera-path frames from the ds1 milestone snapshot
3. hybrid frame sweep: 720p/1080p shadow-sample diagonal over the
   trained lego snapshot (reference profiling.sh protocol)
4. profiler trace: one steady-state train scan block

Each stage probes the relay, runs in a fresh subprocess with a timeout,
and skips itself if its artifact already exists (re-runnable).
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
DOCS = REPO / "docs"
MILESTONE_SNAP = next(
    (p for p in (pathlib.Path("/tmp/milestone_r4/lego_ds1/model.sng"),
                 pathlib.Path("/tmp/milestone/lego_ds1/model.sng"))
     if p.exists()),
    pathlib.Path("/tmp/milestone_r4/lego_ds1/model.sng"))


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


def run(args, timeout_s, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    log("+", " ".join(map(str, args)))
    try:
        r = subprocess.run([sys.executable] + [str(a) for a in args],
                           capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO, env=e)
        sys.stderr.write((r.stderr or "")[-1500:])
        sys.stderr.write((r.stdout or "")[-1500:])
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        log("TIMEOUT")
        return False


def wait_device():
    while not probe():
        log("relay down; waiting 120 s")
        time.sleep(120)


def stage_fox(budget_s=1500):
    d = DOCS / "milestone_fox"
    if (d / "progress.json").exists() and json.loads(
            (d / "progress.json").read_text()).get("evals"):
        log("fox: already done")
        return
    wait_device()
    run(["scripts/milestone.py", "--scene", "/root/reference/data/nerf/fox",
         "--downscale", "4", "--target-steps", "1024",
         "--chunk-steps", "256", "--eval-at", "512,1024",
         "--eval-views", "4", "--budget-s", str(budget_s),
         "--dir", "/tmp/milestone_fox"], budget_s + 2400)
    src = pathlib.Path("/tmp/milestone_fox/fox_ds4")
    if (src / "progress.json").exists():
        d.mkdir(parents=True, exist_ok=True)
        (d / "progress.json").write_text((src / "progress.json").read_text())
        for rd in sorted(src.glob("renders_*")):
            for f in sorted(rd.glob("render_00[01].png")) + sorted(
                    rd.glob("gt_000.png")):
                (d / f"{rd.name}_{f.name}").write_bytes(f.read_bytes())
        log("fox artifacts banked")


def stage_orbit(n_frames=24):
    d = DOCS / "demo_frames" / "lego_orbit"
    if d.exists() and len(list(d.glob("*.png"))) >= n_frames:
        log("orbit: already done")
        return
    if not MILESTONE_SNAP.exists():
        log("orbit: no milestone snapshot yet")
        return
    wait_device()
    run(["scripts/make_demo_path.py", "/tmp/orbit_path.json"], 300)
    run(["-m", "synerfgine_tpu.cli.main", "render",
         "--scene", "/root/reference/data/nerf/lego",
         "--load-snapshot", str(MILESTONE_SNAP),
         "--camera-path", "/tmp/orbit_path.json",
         "--n-frames", str(n_frames), "--width", "400", "--height", "400",
         "--out", str(d)], 3000)


def stage_hybrid():
    done = DOCS / "hybrid_frame_720p.png"
    if done.exists() and (DOCS / "experiments" / "hybrid_sweep.json").exists():
        log("hybrid: already done")
        return
    if not MILESTONE_SNAP.exists():
        log("hybrid: no milestone snapshot yet")
        return
    out = DOCS / "experiments"
    out.mkdir(parents=True, exist_ok=True)
    rows = []
    for H, W, sweep in ((720, 1280, "1"), (1080, 1920, "")):
        wait_device()
        r = subprocess.run(
            [sys.executable, "scripts/exp_hybrid.py"],
            capture_output=True, text=True, timeout=3000, cwd=REPO,
            env={**os.environ, "HYBRID_SNAPSHOT": str(MILESTONE_SNAP),
                 "HYBRID_W": str(W), "HYBRID_H": str(H),
                 "HYBRID_SWEEP": sweep})
        sys.stderr.write((r.stderr or "")[-1200:])
        for ln in (r.stdout or "").splitlines():
            if ln.startswith("{"):
                rows.append(json.loads(ln))
                log(ln)
    (out / "hybrid_sweep.json").write_text(json.dumps(rows, indent=2))


def stage_trace():
    d = DOCS / "profiles" / "r3_trace"
    if d.exists() and any(d.rglob("*.pb")):
        log("trace: already done")
        return
    wait_device()
    run(["-m", "synerfgine_tpu.cli.main", "train",
         "--scene", "/root/reference/data/nerf/lego", "--downscale", "2",
         "--n-steps", "16", "--profile", str(d)]
        + (["--load-snapshot", str(MILESTONE_SNAP)]
           if MILESTONE_SNAP.exists() else []), 2400)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["fox", "orbit", "hybrid", "trace"]
    for s in stages:
        {"fox": stage_fox, "orbit": stage_orbit, "hybrid": stage_hybrid,
         "trace": stage_trace}[s]()
