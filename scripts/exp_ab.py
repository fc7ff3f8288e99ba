"""Round-3 PSNR-level A/B matrix (VERDICT r2 Next #2, PERF.md lattice
adoption gate): same scene, same seeds, same eval protocol; variants
differ in ONE lever each. Runs scripts/milestone.py serially per variant
(one TPU client at a time through the relay) and prints a merged table.

Variants (lego ds2, 1024 steps, eval at 256/512/1024, 4 views):
  base       grid + stochastic single-corner backward + additive_x hash
  exact      --hash-grad exact   (reference's all-8-corner semantics)
  lattice    --hash-mode lattice (full-cell single-gather rows)
  nogrid     --no-grid           (fixed-step march; round-1 quality ref)

Usage:  python scripts/exp_ab.py [--steps 1024] [--downscale 2]
                                 [--only base,exact] [--budget-s 5400]
Results accumulate in docs/experiments/ab_r3/<variant>_ds<d>/progress.json
(resumable; re-running skips finished variants).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT_DEFAULT = REPO / "docs" / "experiments" / "ab_r3"

VARIANTS = {
    "base": {"train": "", "eval": ""},
    "exact": {"train": "--hash-grad exact", "eval": ""},
    "lattice": {"train": "--hash-mode lattice", "eval": ""},
    "nogrid": {"train": "--no-grid", "eval": "--no-grid"},
    # round-4 levers (VERDICT r3 Next #4/#5):
    # quad: additive x+y / scrambled-z face rows — the postmortem's
    # fog-safe encode-transaction halving; adoption gate is PSNR parity
    # with base at the same rungs
    "quad": {"train": "--hash-mode quad", "eval": ""},
    # fp32 MLPs: bf16 (8 mantissa bits) vs the reference's fp16 (10);
    # isolates MLP precision from the quality-per-step gap
    "fp32mlp": {"train": "--mlp-fp32", "eval": ""},
    # shortened dense march after the coarse first-hit pre-pass
    # (sample-set-equal by construction; this measures the step-time
    # win and pins PSNR neutrality on chip)
    "marchskip": {"train": "--march-skip 768", "eval": ""},
    # span-fitted dense march K (sample-set-equal by construction,
    # tests/test_march_span.py; measures the (R, K) march-tensor
    # shrink on chip — lego ds1 fits in ~448 of 1024 steps under cone)
    "spanfit": {"train": "--fit-march-span", "eval": ""},
    # quad rows + the quad face-row EXACT backward (two 4F-wide
    # scatters per sample-level + 4 static rolls — the lattice cell-row
    # trick at quad granularity): exact reference gradients at a
    # fraction of the generic 8-corner scatter cost, without lattice's
    # structured-collision fog. If ds1 shows exact matters, this is the
    # adoptable config.
    "quadexact": {"train": "--hash-mode quad --hash-grad exact",
                  "eval": ""},
    # freeze zero-grad hash rows (instant-ngp paper / tcnn
    # skip_zero_grad): without it, stale momentum keeps moving the ~91%
    # of rows the stochastic backward did NOT touch this step
    "skipzero": {"train": "--adam-skip-zero", "eval": ""},
    # adapt rays on the POST-TERMINATION (compacted) count with a 2x
    # generation capacity — the reference's update_after_training
    # semantics (testbed_nerf.cu:3276-3293, buffer 16x at :3534);
    # supervises ~1.6x more rays per step at ~2x network batch cost
    "adaptkept": {"train": "--adapt-kept", "eval": ""},
    # adapt_kept with the reference's two-phase shape: no-grad density
    # pass on the 2x generation buffer, differentiable fwd+bwd on a
    # re-compacted 1x live batch — same supervision density at a
    # fraction of the 2.2x single-pass step cost
    "adapt2p": {"train": "--adapt-two-pass", "eval": ""},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/data/nerf/lego")
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--eval-at", default="256,512,1024")
    ap.add_argument("--eval-views", type=int, default=4)
    ap.add_argument("--budget-s", type=int, default=5400,
                    help="overall budget; split evenly across variants")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of variants")
    ap.add_argument("--out", default=str(OUT_DEFAULT),
                    help="artifact directory (use ab_r4 for round-4 "
                         "sets so they don't collide with banked r3)")
    args = ap.parse_args()
    OUT = pathlib.Path(args.out)

    names = (args.only.split(",") if args.only else list(VARIANTS))
    per_budget = args.budget_s // len(names)
    for name in names:
        v = VARIANTS[name]
        d = OUT / f"{name}_ds{args.downscale}"
        prog = d / "progress.json"
        if prog.exists():
            p = json.loads(prog.read_text())
            if p["steps"] >= args.steps and len(p["evals"]) >= len(
                    args.eval_at.split(",")):
                print(f"[{name}] already complete", file=sys.stderr)
                continue
        cmd = [sys.executable, str(REPO / "scripts" / "milestone.py"),
               "--scene", args.scene, "--name", name,
               "--downscale", str(args.downscale),
               "--target-steps", str(args.steps),
               "--chunk-steps", "256",
               "--eval-at", args.eval_at,
               "--eval-views", str(args.eval_views),
               "--budget-s", str(per_budget),
               "--dir", str(OUT)]
        # "=" form: argparse rejects option-like values otherwise
        if v["train"]:
            cmd += [f"--train-args={v['train']}"]
        if v["eval"]:
            cmd += [f"--eval-args={v['eval']}"]
        print(f"[{name}] {' '.join(cmd)}", file=sys.stderr)
        subprocess.run(cmd, cwd=REPO)

    # merged table
    rows = []
    for name in names:
        prog = OUT / f"{name}_ds{args.downscale}" / "progress.json"
        if not prog.exists():
            continue
        p = json.loads(prog.read_text())
        for e in p["evals"]:
            rows.append({"variant": name, "step": e["step"],
                         "psnr": round(e["psnr_mean"], 2),
                         "ssim": round(e.get("ssim_mean", 0), 4),
                         "train_s": round(e["train_seconds"], 1)})
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
