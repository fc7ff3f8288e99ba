"""Offline eval harness — the run.py equivalent (scripts/run.py:210-266).

Protocol parity: render each test view at pixel centers with black
background and min_transmittance 1e-4, compare sRGB-clamped MSE -> PSNR
plus SSIM against the GT composited on black.
"""
from __future__ import annotations

import numpy as np

from .metrics import compose_on_background, psnr, ssim


def evaluate_views(
    trainer,
    params,
    dataset,
    grid_state=None,
    n_views: int | None = None,
    width: int | None = None,
    height: int | None = None,
    n_steps: int | None = None,
    write_dir: str | None = None,
    spp: int = 8,
    chunk: int | None = None,
) -> dict:
    """Render every view of `dataset` and compute PSNR/SSIM vs GT.

    spp defaults to 8 — the reference protocol (run.py:231 renders eval
    views at 8 samples per pixel with min_transmittance 1e-4)."""
    import sys
    import time

    results = []
    n = dataset.n_images if n_views is None else min(n_views, dataset.n_images)
    if chunk is None:
        # 16384-px chunks measured 167.9 s/view vs 227.5 at 4096 on the
        # v5e chip at IDENTICAL PSNR (25.519 vs 25.516 — round-5
        # evalchunk pricing, docs/experiments/evalchunk_r5.json): fewer
        # relay dispatches AND better VPU utilization per while-loop
        # iteration. Still overridable via EVAL_CHUNK.
        import os

        chunk = int(os.environ.get("EVAL_CHUNK", "16384"))
    for i in range(n):
        t0 = time.time()
        out = trainer.render_image(
            params, dataset.xforms[i], width=width, height=height,
            grid_state=grid_state, n_steps=n_steps, bg_color=(0.0, 0.0, 0.0),
            spp=spp, chunk=chunk,
        )
        render_s = time.time() - t0
        print(f"view {i}: rendered in {render_s:.1f}s",
              file=sys.stderr, flush=True)
        gt = dataset.images[i].astype(np.float32) / 255.0
        if width and (gt.shape[1] != width or gt.shape[0] != height):
            from PIL import Image

            gt = np.asarray(
                Image.fromarray(dataset.images[i]).resize((width, height))
            ).astype(np.float32) / 255.0
        gt_black = compose_on_background(gt)
        p = psnr(out["rgb"], gt_black)
        s = ssim(np.clip(out["rgb"], 0, 1), np.clip(gt_black, 0, 1))
        results.append({"view": i, "psnr": p, "ssim": s,
                        "render_s": round(render_s, 2)})
        if write_dir:
            import pathlib

            from ..io.image import write_image

            d = pathlib.Path(write_dir)
            d.mkdir(parents=True, exist_ok=True)
            write_image(str(d / f"render_{i:03d}.png"), out["rgb"])
            write_image(str(d / f"gt_{i:03d}.png"), gt_black)
    psnrs = [r["psnr"] for r in results]
    ssims = [r["ssim"] for r in results]
    times = [r["render_s"] for r in results]
    return {
        "per_view": results,
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_min": float(np.min(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "n_views": n,
        # per-view render cost is a first-class result, not a stderr
        # footnote: the first view pays compile, steady state is the
        # minimum (the reference evals 200 views routinely)
        "render_s_total": round(float(np.sum(times)), 2),
        "render_s_steady": round(float(np.min(times)), 2),
    }
