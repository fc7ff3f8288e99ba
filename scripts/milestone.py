"""PSNR-milestone runner: checkpoint-laddered lego training + spp-8 eval.

Drives the CLI in FRESH SUBPROCESSES per chunk (the remote TPU worker is
recycled under sustained load; a fresh process reconnects cleanly),
probing the relay before each chunk, and records progress to a JSON
artifact: steps, accumulated train-window wall-clock, and held-out PSNR
at each eval rung (protocol: spp 8, pixel centers, black bg,
min_transmittance 1e-4 — scripts/run.py:224-252).

Usage (resumable; state in --dir):
    python scripts/milestone.py --scene /root/reference/data/nerf/lego \
        --downscale 1 --target-steps 4000 --chunk-steps 256 \
        --eval-at 512,1024,2048,4000 --budget-s 3000
"""
from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(timeout_s: int = 150) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(float(jnp.ones(3).sum()))"],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_cli(args: list[str], timeout_s: int):
    return subprocess.run(
        [sys.executable, "-m", "synerfgine_tpu.cli.main"] + args,
        capture_output=True, text=True, timeout=timeout_s, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/data/nerf/lego")
    ap.add_argument("--name", default=None, help="artifact name (scene stem)")
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--target-steps", type=int, default=4000)
    ap.add_argument("--chunk-steps", type=int, default=256)
    ap.add_argument("--eval-at", default="512,1024,2048,4000")
    ap.add_argument("--eval-views", type=int, default=8)
    ap.add_argument("--budget-s", type=int, default=3000,
                    help="stop launching new chunks after this much wall time")
    ap.add_argument("--dir", default="/tmp/milestone")
    ap.add_argument("--chunk-timeout", type=int, default=2400)
    ap.add_argument("--eval-timeout", type=int, default=2400)
    ap.add_argument("--train-args", default="",
                    help="extra args for every train chunk, e.g. "
                         "'--hash-grad exact' (A/B experiments)")
    ap.add_argument("--eval-args", default="",
                    help="extra args for every eval, e.g. "
                         "'--hash-mode lattice'")
    args = ap.parse_args()

    name = args.name or pathlib.Path(args.scene).name
    d = pathlib.Path(args.dir) / f"{name}_ds{args.downscale}"
    d.mkdir(parents=True, exist_ok=True)
    snap = d / "model.sng"
    prog_path = d / "progress.json"
    prog = (json.loads(prog_path.read_text()) if prog_path.exists()
            else {"scene": args.scene, "downscale": args.downscale,
                  "steps": 0, "train_seconds": 0.0, "evals": []})
    eval_rungs = sorted(int(x) for x in args.eval_at.split(","))

    def run_pending_evals():
        # an eval at step S covers every rung <= S (the snapshot cannot
        # be rewound; late evals record their actual step)
        done_evals = {e["step"] for e in prog["evals"]}
        pending = [r for r in eval_rungs
                   if r <= prog["steps"]
                   and not any(s >= r for s in done_evals)]
        if not pending or not snap.exists():
            return
        log(f"eval at step {prog['steps']} (pending rungs {pending})")
        try:
            r = run_cli(
                ["eval", "--scene", args.scene,
                 "--downscale", str(args.downscale),
                 "--load-snapshot", str(snap),
                 "--n-views", str(args.eval_views),
                 "--out", str(d / f"renders_{prog['steps']}")]
                + (args.eval_args.split() if args.eval_args else []),
                args.eval_timeout)
        except subprocess.TimeoutExpired:
            log("eval timed out")
            return
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            rep = json.loads(line)
            rep["step"] = prog["steps"]
            rep["train_seconds"] = prog["train_seconds"]
            rep["wallclock_s"] = time.time() - t_start
            prog["evals"].append(rep)
            prog_path.write_text(json.dumps(prog, indent=2))
            log(f"PSNR @ {prog['steps']}: {rep.get('psnr_mean'):.2f} dB")
        else:
            log(f"eval failed rc={r.returncode}")
            sys.stderr.write((r.stderr or "")[-2000:])

    t_start = time.time()
    while prog["steps"] < args.target_steps:
        if time.time() - t_start > args.budget_s:
            log(f"budget exhausted at step {prog['steps']}")
            break
        if not probe():
            log("relay down; waiting 120 s")
            time.sleep(120)
            continue
        run_pending_evals()
        n = min(args.chunk_steps, args.target_steps - prog["steps"])
        # stop the chunk exactly at the next eval rung
        for r in eval_rungs:
            if prog["steps"] < r <= prog["steps"] + n:
                n = r - prog["steps"]
        cli = ["train", "--scene", args.scene,
               "--downscale", str(args.downscale),
               "--n-steps", str(n), "--save-snapshot", str(snap),
               "--snapshot-optimizer", "--save-every", "128",
               "--test-every", "8"]
        if snap.exists():
            cli += ["--load-snapshot", str(snap)]
        if args.train_args:
            cli += args.train_args.split()
        log(f"chunk: steps {prog['steps']} -> {prog['steps'] + n}")
        t0 = time.time()
        try:
            r = run_cli(cli, args.chunk_timeout)
        except subprocess.TimeoutExpired:
            log("chunk timed out; retrying")
            continue
        dt = time.time() - t0
        sys.stderr.write(r.stderr[-2000:] if r.stderr else "")
        if r.returncode != 0:
            log(f"chunk failed rc={r.returncode}; retrying after 60 s")
            time.sleep(60)
            continue
        prog["steps"] += n
        prog["train_seconds"] += dt
        prog_path.write_text(json.dumps(prog, indent=2))
        log(f"step {prog['steps']} (chunk {dt:.0f}s, "
            f"total train {prog['train_seconds']:.0f}s)")

    run_pending_evals()
    print(json.dumps(prog, indent=2))


if __name__ == "__main__":
    main()
