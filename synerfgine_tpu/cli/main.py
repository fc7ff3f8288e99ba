"""CLI frontend — capability match for src/main.cu + scripts/run.py,
headless (the reference itself supports --no-gui; GUI paths are out of
scope per SURVEY.md Appendix A).

Subcommands:
  train   — train a NeRF from a transforms.json scene
  eval    — PSNR/SSIM over held-out or explicit test views
  render  — render frames from dataset cameras or a camera path
  fit-image — 2D image-fit mode (testbed_image equivalent)

Usage examples:
  python -m synerfgine_tpu.cli.main train --scene /data/lego --n-steps 2000 \
      --save-snapshot lego.sng
  python -m synerfgine_tpu.cli.main eval --scene /data/lego \
      --load-snapshot lego.sng --test-every 8
"""
from __future__ import annotations

import argparse
import json
import pathlib
import time

# snapshot hash_version -> HashEncoding hash_mode (io/snapshot.py gate)
_HV_MODE = {1: "xor", 2: "additive_x", 3: "lattice", 4: "quad"}


def _adopt_snapshot_hash_mode(args, snapshot_path):
    """Make the network's hash mode follow the snapshot being loaded
    (unless the user passed --hash-mode explicitly): tables indexed under
    one hash are garbage under another, so eval/render/resume must
    construct the same indexing the snapshot was trained with."""
    if getattr(args, "hash_mode", None) is not None:
        return None
    from ..io.snapshot import load_snapshot

    snap = load_snapshot(snapshot_path, hash_version=None)
    args.hash_mode = _HV_MODE.get(snap["hash_version"], "additive_x")
    return snap


def _build_trainer(args, dataset):
    import jax

    from ..core.config import NGPNetworkConfig
    from ..nn.nerf_network import NerfNetwork
    from ..train.nerf_trainer import NerfTrainer

    if args.config:
        cfg = NGPNetworkConfig.from_json(args.config)
    else:
        cfg = NGPNetworkConfig()
    if (getattr(args, "hash_mode", None) or "additive_x") == "lattice":
        import sys

        print(
            "WARNING: --hash-mode lattice holds PSNR at small scale but "
            "its STRUCTURED collisions fog full-resolution training "
            "(measured: lego ds1 regressed 24.7 -> 22.5 dB; see "
            "PERF.md 'lattice postmortem'). Use the default additive_x "
            "unless you are benchmarking the encode.",
            file=sys.stderr)
    net = NerfNetwork(cfg, aabb_scale=dataset.aabb_scale,
                      n_extra_dims=getattr(args, "n_extra_dims", 0),
                      use_pallas_mlp=getattr(args, "pallas_mlp", False),
                      hash_grad=getattr(args, "hash_grad", "stochastic"),
                      hash_mode=getattr(args, "hash_mode", None) or "additive_x",
                      mlp_fp32=getattr(args, "mlp_fp32", False))
    trainer = NerfTrainer(
        net,
        dataset,
        n_rays=args.n_rays,
        batch_size=args.batch_size,
        use_grid=not args.no_grid,
        optimize_extrinsics=getattr(args, "optimize_extrinsics", False),
        optimize_exposure=getattr(args, "optimize_exposure", False),
        use_error_map=getattr(args, "error_map", False),
        train_envmap=getattr(args, "train_envmap", False),
        train_distortion=getattr(args, "train_distortion", False),
        n_extra_dims=getattr(args, "n_extra_dims", 0),
        depth_supervision_lambda=getattr(args, "depth_lambda", 0.0),
        adam_skip_zero_grad=getattr(args, "adam_skip_zero", False),
        snap_to_pixel_centers=not getattr(args, "no_snap_pixel_centers",
                                          False),
        march_skip_steps=getattr(args, "march_skip", 0),
        fit_march_span=getattr(args, "fit_march_span", False),
        adapt_kept=(getattr(args, "adapt_kept", False)
                    or getattr(args, "adapt_two_pass", False)),
        adapt_two_pass=getattr(args, "adapt_two_pass", False),
        scan_block_steps=getattr(args, "scan_block", None),
        sharpness_weighted=getattr(args, "sharpness_weighted", False),
    )
    return trainer


def _load_scene(args, split: str = "train"):
    """Accept a registered scene name ("lego", "fox", ...) or a path;
    names resolve through eval/scenes.py (run.py --scene parity)."""
    import pathlib as _pl

    from ..data import load_nerf_dataset
    from ..eval.scenes import resolve_scene

    e = resolve_scene(str(args.scene))
    d = _pl.Path(e["data_dir"])
    name = e["dataset_train"] if split == "train" else e["dataset_test"]
    if not (d / name).exists():
        name = "transforms.json"
    return load_nerf_dataset(d, transforms_name=name,
                             downscale=args.downscale), e


def cmd_train(args):
    import jax

    from ..io.snapshot import save_snapshot, load_snapshot, restore_train_state

    ds, scene_entry = _load_scene(args)
    # explicit test split (transforms_test.json) wins over held-out views
    has_explicit_test = (scene_entry["dataset_train"]
                         != scene_entry["dataset_test"])
    if args.test_every > 0 and not has_explicit_test:
        ds, test_ds = ds.train_test_split(args.test_every)
    snap = (_adopt_snapshot_hash_mode(args, args.load_snapshot)
            if args.load_snapshot else None)
    trainer = _build_trainer(args, ds)

    # multi-chip training from the product path (the reference only ever
    # auto-used aux GPUs for rendering, testbed.cu:5017-5138; training
    # here is data-parallel over every requested device)
    mesh = None
    mesh_arg = getattr(args, "mesh", "none") or "none"
    if mesh_arg != "none":
        n_avail = len(jax.devices())
        n_use = n_avail if mesh_arg == "auto" else int(mesh_arg)
        if n_use > 1:
            from ..dist.mesh import make_mesh
            from ..dist.sharded import ShardedNerfTrainer

            mesh = make_mesh(n_use)
            # takes over the trainer's jitted entries; the host loop
            # below is unchanged
            ShardedNerfTrainer(trainer, mesh)
            print(f"data-parallel mesh: {mesh.devices.size} devices, "
                  f"{jax.process_count()} host(s)")
        elif mesh_arg == "auto":
            print("mesh auto: 1 device visible, running single-device")

    def _replicate(st):
        if mesh is None:
            return st
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(st, NamedSharding(mesh, P()))

    if args.load_snapshot:
        if snap is None:  # user forced --hash-mode: gate on its version
            snap = load_snapshot(
                args.load_snapshot,
                hash_version=trainer.network.pos_encoding.hash_version)
        state = _replicate(restore_train_state(trainer, snap))
    else:
        state = _replicate(trainer.init(jax.random.PRNGKey(args.seed)))

    def save(path):
        save_snapshot(
            path, state.params, state.opt_state, state.grid,
            step=trainer.host_step,
            dataset_meta={"scene": str(args.scene), "n_images": ds.n_images,
                          "aabb_scale": ds.aabb_scale},
            include_optimizer=args.snapshot_optimizer,
            hash_version=trainer.network.pos_encoding.hash_version,
            adaptive_rays=getattr(trainer, "_adaptive_rays", None),
        )

    if getattr(args, "profile", None):
        # committed-trace workflow (SURVEY.md 5.1): one warm block under
        # jax.profiler; view with tensorboard or perfetto
        import jax.profiler

        state, _ = trainer.train(state, trainer.scan_block_steps)  # compile
        with jax.profiler.trace(args.profile):
            state, _ = trainer.train(state, trainer.scan_block_steps)
        print(f"profiler trace written to {args.profile}")

    t0 = time.time()
    log_every = max(1, args.n_steps // 20)
    done = 0
    save_every = args.save_every or args.n_steps
    while done < args.n_steps:
        n = min(save_every, args.n_steps - done)
        state, _ = trainer.train(state, n, log_every=log_every)
        done += n
        if args.save_snapshot and done < args.n_steps:
            save(args.save_snapshot)
            print(f"checkpointed at step {trainer.host_step}")
    print(f"trained {args.n_steps} steps in {time.time()-t0:.1f}s "
          f"(total step {trainer.host_step})")

    if args.save_snapshot:
        # save RAW params (+ optimizer state incl. the EMA copy) so
        # training resumes exactly; renderers use the EMA params from the
        # optimizer state
        save(args.save_snapshot)
        print(f"saved snapshot to {args.save_snapshot}")
    return state, trainer


def cmd_eval(args):
    import jax

    from ..eval.harness import evaluate_views
    from ..io.snapshot import load_snapshot, restore_train_state

    ds, scene_entry = _load_scene(args)
    if scene_entry["dataset_train"] != scene_entry["dataset_test"]:
        train_ds = ds
        test_ds, _ = _load_scene(args, split="test")
    else:
        train_ds, test_ds = ds.train_test_split(args.test_every)
    snap = _adopt_snapshot_hash_mode(args, args.load_snapshot)
    trainer = _build_trainer(args, train_ds)
    if snap is None:
        snap = load_snapshot(
            args.load_snapshot,
            hash_version=trainer.network.pos_encoding.hash_version)
    state = restore_train_state(trainer, snap)
    report = evaluate_views(
        trainer, trainer.inference_params(state), test_ds,
        grid_state=state.grid if not args.no_grid else None,
        n_views=args.n_views, write_dir=args.out,
    )
    print(json.dumps({k: v for k, v in report.items() if k != "per_view"}))
    for r in report["per_view"]:
        print(f"view {r['view']:3d}: psnr {r['psnr']:.2f} ssim {r['ssim']:.4f}")
    return report


def cmd_render(args):
    import jax
    import numpy as np

    from ..io.image import write_image
    from ..io.snapshot import load_snapshot, restore_train_state

    ds, _ = _load_scene(args)
    snap = _adopt_snapshot_hash_mode(args, args.load_snapshot)
    trainer = _build_trainer(args, ds)
    if snap is None:
        snap = load_snapshot(
            args.load_snapshot,
            hash_version=trainer.network.pos_encoding.hash_version)
    state = restore_train_state(trainer, snap)
    out_dir = pathlib.Path(args.out or "renders")
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.camera_path:
        # spline-interpolated video frames (run.py video path; assemble
        # with ffmpeg externally)
        from ..render.camera_path import CameraPath

        cp = CameraPath.load(args.camera_path)
        n = args.n_frames
        params = trainer.inference_params(state)
        for i in range(n):
            kf = cp.eval(i / max(n - 1, 1))
            out = trainer.render_image(
                params, kf.to_matrix(),
                width=args.width, height=args.height,
                grid_state=state.grid if not args.no_grid else None,
            )
            write_image(str(out_dir / f"frame_{i:04d}.png"), out["rgb"])
        print(f"wrote {n} camera-path frames to {out_dir}")
        return
    n = args.n_views or ds.n_images
    params = trainer.inference_params(state)
    for i in range(min(n, ds.n_images)):
        out = trainer.render_image(
            params, ds.xforms[i],
            width=args.width, height=args.height,
            grid_state=state.grid if not args.no_grid else None,
        )
        write_image(str(out_dir / f"frame_{i:04d}.png"), out["rgb"])
    print(f"wrote {min(n, ds.n_images)} frames to {out_dir}")


def cmd_hybrid(args):
    """The reference's `--snapshot X --virtual scene.json` demo flow
    (main.cu:190-224): load a trained NeRF snapshot + a virtual scene,
    replay the camera path, write frames."""
    import jax
    import numpy as np

    from ..core.config import NGPNetworkConfig
    from ..grid.occupancy import OccupancyGrid
    from ..hybrid.engine import Engine
    from ..hybrid.scene import load_scene_json
    from ..io.snapshot import load_snapshot
    from ..nn.nerf_network import NerfNetwork

    snap = load_snapshot(args.load_snapshot, hash_version=None)
    cfg = NGPNetworkConfig.from_json(args.config) if args.config else NGPNetworkConfig()
    aabb_scale = snap["dataset_meta"].get("aabb_scale", 1)
    net = NerfNetwork(cfg, aabb_scale=aabb_scale,
                      hash_mode=_HV_MODE.get(snap["hash_version"],
                                             "additive_x"))
    ref = net.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    params = jax.tree.unflatten(
        jax.tree.structure(ref), [jnp.asarray(a) for a in snap["params"]]
    )
    grid = OccupancyGrid(aabb_scale)
    gstate = grid.init()
    if snap["density_grid"] is not None:
        gstate = grid.finalize(gstate._replace(
            density=jnp.asarray(snap["density_grid"])))

    scene = load_scene_json(args.virtual)
    if args.light_samples:
        scene.settings.light_samples = args.light_samples
    if args.shadow_samples:
        scene.settings.shadow_samples = args.shadow_samples
    if args.bounces:
        scene.settings.path_trace_depth = args.bounces
    if args.out:
        scene.output_folder = args.out
        scene.record = True
    engine = Engine(net, params, grid, gstate, scene,
                    width=args.width, height=args.height)
    n_frames = args.n_frames or (scene.cam_path.n_frames if scene.cam_path else 1)
    import time

    for i in range(n_frames):
        t0 = time.time()
        engine.frame()
        print(f"frame {i+1}/{n_frames}: {(time.time()-t0)*1000:.0f} ms "
              f"(syn {engine.timings.get('syn', 0)*1000:.0f} "
              f"nerf {engine.timings.get('nerf', 0)*1000:.0f} "
              f"shadow {engine.timings.get('nerf_shadow', 0)*1000:.0f})")
        if engine.finished():
            break
    print(f"wrote frames to {scene.output_folder}" if scene.record else "done")


def cmd_fit_image(args):
    import numpy as np

    from ..core.config import NGPNetworkConfig
    from ..io.image import read_image, write_image
    from ..train.image_fit import fit_image

    img = read_image(args.image)[..., :3]
    cfg = NGPNetworkConfig.from_json(args.config) if args.config else None
    trainer, state, losses = fit_image(
        img, cfg, n_steps=args.n_steps, log_every=max(1, args.n_steps // 10)
    )
    mse = trainer.compute_mse(state)
    print(f"final mse {mse:.6f} psnr {-10*np.log10(mse):.2f} dB")
    if args.out:
        write_image(args.out, np.clip(trainer.render(state), 0, 1))


def cmd_import_ingp(args):
    """Reference .ingp -> native snapshot (hash_version 1). Render/eval
    the result with --hash-mode xor."""
    from ..io.ingp import import_ingp

    info = import_ingp(args.input, args.output)
    print(f"imported {args.input} -> {args.output} "
          f"(step {info['step']}, aabb_scale {info['aabb_scale']}, "
          f"{info['n_params']} params); use --hash-mode xor to load")


def cmd_export_ingp(args):
    """Native snapshot -> reference .ingp."""
    import jax

    from ..core.config import NGPNetworkConfig
    from ..grid.occupancy import OccupancyGrid
    from ..io.ingp import export_ingp
    from ..io.snapshot import load_snapshot
    from ..nn.nerf_network import NerfNetwork

    snap = load_snapshot(args.input, hash_version=None)
    cfg = (NGPNetworkConfig.from_json(args.config) if args.config
           else NGPNetworkConfig())
    aabb_scale = snap["dataset_meta"].get("aabb_scale", 1)
    net = NerfNetwork(cfg, aabb_scale=aabb_scale,
                      hash_mode=_HV_MODE.get(snap["hash_version"],
                                             "additive_x"))
    import jax.numpy as jnp

    ref = net.init(jax.random.PRNGKey(0))
    params = jax.tree.unflatten(
        jax.tree.structure(ref), [jnp.asarray(a) for a in snap["params"]])
    gstate = None
    if snap["density_grid"] is not None:
        og = OccupancyGrid(aabb_scale)
        gstate = og.init()._replace(
            density=jnp.asarray(snap["density_grid"]))
    export_ingp(args.output, net, params, gstate, step=snap["step"],
                aabb_scale=aabb_scale)
    if snap["hash_version"] != 1:
        print("note: tables use the additive-x hash (hash_version 2); "
              "hashed levels will not be bit-compatible with tcnn "
              "indexing. Train with --hash-mode xor for full interchange.")
    print(f"exported {args.input} -> {args.output}")


def cmd_convert_image(args):
    from ..io.image import read_image, write_bin_image

    img = read_image(args.input, to_linear=True)
    out = args.output or (str(pathlib.Path(args.input).with_suffix("")) + ".bin")
    write_bin_image(out, img)
    print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")


def cmd_record3d(args):
    from ..data.record3d import record3d_to_nerf

    out = record3d_to_nerf(args.scene, rotate=args.rotate,
                           subsample=args.subsample)
    print(f"wrote {out}")


def cmd_mask_images(args):
    from ..data.masks import mask_images

    n = mask_images(args.images, args.masks)
    print(f"installed {n} masks")


def main(argv=None):
    p = argparse.ArgumentParser(prog="synerfgine-tpu")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) — the env's "
                        "sitecustomize overrides JAX_PLATFORMS, so this "
                        "flag is the reliable way to run CPU-only")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before device "
                        "use (coordinator from the standard JAX env vars "
                        "or the TPU metadata server); combine with "
                        "'train --mesh auto' so the mesh spans all hosts")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene", required=True)
        sp.add_argument("--config", default=None)
        sp.add_argument("--downscale", type=int, default=1)
        sp.add_argument("--n-rays", type=int, default=4096)
        sp.add_argument("--batch-size", type=int, default=1 << 18)
        sp.add_argument("--no-grid", action="store_true")
        sp.add_argument("--test-every", type=int, default=8)
        sp.add_argument("--seed", type=int, default=1337)
        sp.add_argument("--scan-block", type=int, default=None,
                        help="train steps fused per device dispatch")
        sp.add_argument("--hash-mode", default=None,
                        choices=["additive_x", "xor", "lattice", "quad"],
                        help="hash indexing: additive_x (fast paired "
                             "gather), xor (tcnn/.ingp compatible), "
                             "lattice (full-cell single-gather rows), or "
                             "quad (additive x+y face rows, scrambled z)")
        sp.add_argument("--mlp-fp32", action="store_true",
                        help="run the MLPs in fp32 instead of bf16 "
                             "(quality A/B lever)")
        sp.add_argument("--adam-skip-zero", action="store_true",
                        help="freeze hash rows with exactly-zero gradient "
                             "each step (instant-ngp paper / tcnn "
                             "skip_zero_grad)")
        sp.add_argument("--no-snap-pixel-centers", action="store_true",
                        help="train rays at continuous sub-pixel uv "
                             "instead of the reference's texel-center "
                             "snap (A/B lever)")

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--n-steps", type=int, default=35000)
    sp.add_argument("--save-snapshot", default=None)
    sp.add_argument("--load-snapshot", default=None)
    sp.add_argument("--snapshot-optimizer", action="store_true")
    sp.add_argument("--save-every", type=int, default=0,
                    help="checkpoint cadence in steps (0 = only at end)")
    sp.add_argument("--optimize-extrinsics", action="store_true",
                    help="per-image pose refinement")
    sp.add_argument("--optimize-exposure", action="store_true")
    sp.add_argument("--error-map", action="store_true",
                    help="error-map importance sampling of pixels")
    sp.add_argument("--train-envmap", action="store_true")
    sp.add_argument("--train-distortion", action="store_true")
    sp.add_argument("--n-extra-dims", type=int, default=0,
                    help="per-image latent code size")
    sp.add_argument("--pallas-mlp", action="store_true",
                    help="use the Pallas fused-MLP kernels (VMEM-resident)")
    sp.add_argument("--sharpness-weighted", action="store_true",
                    help="scale per-ray loss by image-sharpness weights")
    sp.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of one scan block "
                         "to this directory before training")
    sp.add_argument("--depth-lambda", type=float, default=0.0,
                    help="depth-supervision weight")
    sp.add_argument("--march-skip", type=int, default=0,
                    help="coarse first-hit pre-pass + dense march of this "
                         "many steps (0 = full 1024-step march); the "
                         "steps must cover the scene's occupied span")
    sp.add_argument("--adapt-kept", action="store_true",
                    help="adapt the ray count on the post-termination "
                         "(compacted) sample count like the reference's "
                         "update_after_training, with a 2x generation "
                         "capacity — ~1.6x more rays supervised per step")
    sp.add_argument("--adapt-two-pass", action="store_true",
                    help="adapt_kept with the reference's two-phase "
                         "shape: no-grad density pass on the 2x "
                         "generation buffer, differentiable fwd+bwd on "
                         "a re-compacted 1x live batch (implies "
                         "--adapt-kept; recovers most of its 2x step "
                         "cost)")
    sp.add_argument("--fit-march-span", action="store_true",
                    help="clamp the dense training march to a "
                         "conservative stepping-span bound computed from "
                         "the dataset cameras (sample-set-equal; shrinks "
                         "the (R, K) march tensors ~2-3x for cameras "
                         "outside the aabb under cone stepping)")
    sp.add_argument("--hash-grad", default="stochastic",
                    choices=["stochastic", "exact"],
                    help="hash-table backward: unbiased single-corner "
                         "scatter or exact all-corner scatter")
    sp.add_argument("--mesh", default="none",
                    help="'auto' = data-parallel over all local devices; "
                         "N = first N devices; 'none' = single device")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval")
    common(sp)
    sp.add_argument("--load-snapshot", required=True)
    sp.add_argument("--n-views", type=int, default=None)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("render")
    common(sp)
    sp.add_argument("--load-snapshot", required=True)
    sp.add_argument("--out", default=None)
    sp.add_argument("--n-views", type=int, default=None)
    sp.add_argument("--width", type=int, default=None)
    sp.add_argument("--height", type=int, default=None)
    sp.add_argument("--camera-path", default=None,
                    help="CameraPath json; renders spline frames instead")
    sp.add_argument("--n-frames", type=int, default=60)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("hybrid")
    sp.add_argument("--load-snapshot", required=True)
    sp.add_argument("--virtual", required=True, help="virtual scene json")
    sp.add_argument("--config", default=None)
    sp.add_argument("--width", type=int, default=640)
    sp.add_argument("--height", type=int, default=360)
    sp.add_argument("--n-frames", type=int, default=None)
    sp.add_argument("--out", default=None)
    sp.add_argument("--light-samples", type=int, default=None,
                    help="override scene light_samples (preview)")
    sp.add_argument("--shadow-samples", type=int, default=None)
    sp.add_argument("--bounces", type=int, default=None)
    sp.set_defaults(fn=cmd_hybrid)

    sp = sub.add_parser("fit-image")
    sp.add_argument("--image", required=True)
    sp.add_argument("--config", default=None)
    sp.add_argument("--n-steps", type=int, default=1000)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_fit_image)

    sp = sub.add_parser("import-ingp",
                        help="reference .ingp -> native snapshot")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_import_ingp)

    sp = sub.add_parser("export-ingp",
                        help="native snapshot -> reference .ingp")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--config", default=None)
    sp.set_defaults(fn=cmd_export_ingp)

    # dataset tools (scripts/{convert_image,record3d2nerf,mask_images}.py)
    sp = sub.add_parser("convert-image",
                        help="image -> fp16 .bin (fast gigapixel loads)")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", default=None)
    sp.set_defaults(fn=cmd_convert_image)

    sp = sub.add_parser("record3d", help="Record3D capture -> transforms.json")
    sp.add_argument("--scene", required=True)
    sp.add_argument("--rotate", action="store_true")
    sp.add_argument("--subsample", type=int, default=1)
    sp.set_defaults(fn=cmd_record3d)

    sp = sub.add_parser("mask-images",
                        help="install dynamic_mask_* training masks")
    sp.add_argument("--images", required=True)
    sp.add_argument("--masks", required=True,
                    help="dir of masks with matching stems")
    sp.set_defaults(fn=cmd_mask_images)

    args = p.parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        # must run before any backend/device query
        jax.distributed.initialize()
    # persistent compile cache: chunked/laddered runs re-launch fresh
    # processes constantly; without this every chunk pays minutes of
    # remote AOT compilation
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).resolve().parents[2]
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return args.fn(args)


if __name__ == "__main__":
    main()
