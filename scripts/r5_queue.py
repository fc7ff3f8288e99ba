"""Round-5 serialized chip queue (VERDICT r4 "Next round: do this").

Stage order follows the verdict: quality A/Bs and render-cost pricing
BEFORE the long ladder; hybrid sweep as soon as a trained snapshot
exists; fox/orbit/bench close the round. Exactly ONE TPU client runs at
a time (relay RESOURCE_EXHAUSTs on contention); every stage probes the
relay, runs in subprocesses with timeouts, and skips itself when its
artifact exists — the whole queue is resumable.

Default stage list (in order):
  evalchunk  price EVAL_CHUNK 4096 vs 16384 on the ab base snapshot
  abrest     quadexact / skipzero / fp32mlp at ds1 (adopts the faster
             eval chunk when pricing says so)
  quadperf   quad vs base train-step time at ds1 (256 steps, no eval)
  ladder     fresh honest ds1 ladder 512/1024/2048/4000 (A/B winner
             folded in via LADDER_TRAIN_ARGS when one clears +0.5 dB)
  hybrid     720p shadow-sample diagonal + 1080p hybrid frame table
  fox        big-aabb fox ladder artifact
  orbit      lego orbit strip from the ds1 snapshot
  mosaic     Pallas VMEM gather shaping re-test (timeboxed)
  bench      bench.py round JSON

Usage: python scripts/r5_queue.py [stage ...]
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
EXP = DOCS / "experiments"
AB = EXP / "ab_r5"
AB_SNAP = AB / "base_ds1" / "model.sng"
LADDER_DIR = pathlib.Path("/tmp/milestone_r5")
LADDER_SNAP = LADDER_DIR / "lego_ds1" / "model.sng"


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


def best_snapshot():
    return LADDER_SNAP if LADDER_SNAP.exists() else (
        AB_SNAP if AB_SNAP.exists() else None)


def eval_chunk_env():
    """Adopt EVAL_CHUNK=16384 when the pricing stage showed >=10% faster
    steady render at unchanged PSNR."""
    ecj = EXP / "evalchunk_r5.json"
    if not ecj.exists():
        return {}
    rows = {r["eval_chunk"]: r for r in json.loads(ecj.read_text())}
    a, b = rows.get(4096), rows.get(16384)
    if (a and b and b["render_s_steady"] < 0.9 * a["render_s_steady"]
            and abs(b["psnr_mean"] - a["psnr_mean"]) < 0.05):
        log(f"adopting EVAL_CHUNK=16384 ({b['render_s_steady']}s vs "
            f"{a['render_s_steady']}s/view)")
        return {"EVAL_CHUNK": "16384"}
    return {}


def stage_evalchunk():
    out = EXP / "evalchunk_r5.json"
    # done only when BOTH chunk rows landed (a timeout on the second
    # config must not mark the stage complete — resumability)
    if out.exists() and len({r["eval_chunk"] for r in
                             json.loads(out.read_text())}) >= 2:
        log("evalchunk: already done")
        return
    snap = best_snapshot()
    if snap is None:
        log("evalchunk: no snapshot yet")
        return
    rows = []
    for ch in ("4096", "16384"):
        wait_device()
        lines = run(["-m", "synerfgine_tpu.cli.main", "eval",
                     "--scene", "/root/reference/data/nerf/lego",
                     "--load-snapshot", str(snap), "--n-views", "2"],
                    2400, env={"EVAL_CHUNK": ch})
        for ln in lines or []:
            row = json.loads(ln)
            row["eval_chunk"] = int(ch)
            rows.append(row)
            log(ln)
    if rows:
        out.write_text(json.dumps(rows, indent=2))


def stage_abrest():
    env = eval_chunk_env()
    wait_device()
    run(["scripts/exp_ab.py",
         "--only", "quadexact,skipzero,fp32mlp",
         "--steps", "1024", "--downscale", "1",
         "--eval-at", "512,1024", "--eval-views", "2",
         "--budget-s", "9000", "--out", str(AB)], 12000,
        env=env or None)


def stage_quadperf():
    # step-TIME pair at ds1 (eval-at beyond steps => no eval): the
    # quad-row layout's 2-transactions/cell encode vs additive_x
    wait_device()
    run(["scripts/exp_ab.py",
         "--only", "base,quad",
         "--steps", "256", "--downscale", "1",
         "--eval-at", "100000", "--eval-views", "1",
         "--budget-s", "1800", "--out", str(EXP / "ab_r5_ds1t")], 3600)


def ab_winner_args():
    """One adoptable lever, one variable at a time: the first variant
    that beats base by >= 0.5 dB at the 1024 rung."""
    if os.environ.get("LADDER_TRAIN_ARGS") is not None:
        return os.environ["LADDER_TRAIN_ARGS"]
    def psnr_at(name, step):
        p = AB / f"{name}_ds1" / "progress.json"
        if not p.exists():
            return None
        for e in json.loads(p.read_text()).get("evals", []):
            if e["step"] == step:
                return e["psnr_mean"]
        return None
    base = psnr_at("base", 1024)
    if base is None:
        return ""
    for name, args in (("quadexact", "--hash-mode quad --hash-grad exact"),
                       ("skipzero", "--adam-skip-zero"),
                       ("fp32mlp", "--mlp-fp32")):
        p = psnr_at(name, 1024)
        if p is not None and p >= base + 0.5:
            log(f"ladder adopts {name} (+{p - base:.2f} dB at 1024)")
            return args
    return ""


def stage_ladder():
    prog = LADDER_DIR / "lego_ds1" / "progress.json"
    if prog.exists() and json.loads(prog.read_text()).get("steps", 0) >= 4000:
        log("ladder: already done")
    else:
        env = eval_chunk_env()
        args = ab_winner_args()
        wait_device()
        cmd = ["scripts/milestone.py",
               "--scene", "/root/reference/data/nerf/lego",
               "--downscale", "1", "--target-steps", "4000",
               "--chunk-steps", "256",
               "--eval-at", "512,1024,2048,4000", "--eval-views", "4",
               "--budget-s", "9000", "--dir", str(LADDER_DIR)]
        if args:
            cmd.append(f"--train-args={args}")
        run(cmd, 12000, env=env or None)
    # bank artifacts
    src = LADDER_DIR / "lego_ds1"
    if (src / "progress.json").exists():
        d = DOCS / "milestone_lego_r5"
        d.mkdir(parents=True, exist_ok=True)
        (d / "progress.json").write_text((src / "progress.json").read_text())
        for rd in sorted(src.glob("renders_*")):
            for f in (sorted(rd.glob("render_00[01].png"))
                      + sorted(rd.glob("gt_000.png"))):
                (d / f"{rd.name}_{f.name}").write_bytes(f.read_bytes())
        log("ladder artifacts banked")


def stage_hybrid():
    out = EXP / "hybrid_sweep_r5.json"
    # done only when both resolutions landed (4 sweep configs at 720p +
    # 1 at 1080p); a partial write must not mark the stage complete
    if out.exists():
        rows = json.loads(out.read_text())
        if {r["metric"] for r in rows} >= {"hybrid_frame_ms_720p",
                                           "hybrid_frame_ms_1080p"}:
            log("hybrid: already done")
            return
    snap = best_snapshot()
    if snap is None:
        log("hybrid: no snapshot")
        return
    EXP.mkdir(parents=True, exist_ok=True)
    rows = []
    for H, W, sweep, reps in ((720, 1280, "1", 2), (1080, 1920, "", 2)):
        wait_device()
        lines = run(["scripts/exp_hybrid.py"], 7200,
                    env={"HYBRID_SNAPSHOT": str(snap), "HYBRID_W": str(W),
                         "HYBRID_H": str(H), "HYBRID_SWEEP": sweep,
                         "HYBRID_REPS": str(reps)})
        for ln in lines or []:
            rows.append(json.loads(ln))
            log(ln)
        if rows:
            out.write_text(json.dumps(rows, indent=2))
    if rows:
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
         "--eval-views", "4", "--budget-s", "2400",
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
    d = DOCS / "demo_frames" / "lego_orbit_r5"
    if d.exists() and len(list(d.glob("*.png"))) >= n_frames:
        log("orbit: already done")
        return
    snap = best_snapshot()
    if snap is None:
        log("orbit: no snapshot")
        return
    wait_device()
    run(["scripts/make_demo_path.py", "/tmp/orbit_path.json"], 300)
    run(["-m", "synerfgine_tpu.cli.main", "render",
         "--scene", "/root/reference/data/nerf/lego",
         "--load-snapshot", str(snap),
         "--camera-path", "/tmp/orbit_path.json",
         "--n-frames", str(n_frames), "--width", "400", "--height", "400",
         "--out", str(d)], 3600, env=eval_chunk_env() or None)


def stage_mosaic():
    wait_device()
    run(["scripts/exp_mosaic_gather.py"], 1200,
        out_file=EXP / "mosaic_gather_r5.json")


def stage_bench():
    wait_device()
    run(["bench.py"], 3600, out_file=EXP / "bench_preview_r5.json")


STAGES = {"evalchunk": stage_evalchunk, "abrest": stage_abrest,
          "quadperf": stage_quadperf, "ladder": stage_ladder,
          "hybrid": stage_hybrid, "fox": stage_fox, "orbit": stage_orbit,
          "mosaic": stage_mosaic, "bench": stage_bench}

if __name__ == "__main__":
    names = sys.argv[1:] or ["evalchunk", "abrest", "quadperf", "ladder",
                             "hybrid", "fox", "orbit", "mosaic", "bench"]
    for s in names:
        log(f"=== stage {s} ===")
        STAGES[s]()
    log("queue done")
