"""Generate a NeRF dataset by path-tracing a shipped OBJ with the hybrid
tracer — an additional scene for the eval harness.

The reference's PSNR protocol runs over the 8 Synthetic-NeRF scenes;
this environment ships only lego (synthetic) and fox (real capture), so
additional harness scenes are *generated*: the synthetic-object tracer
renders ground-truth views of a known mesh (default armadillo + point
light, Lambertian) on a ring of cameras, and the output trains/evals
through exactly the same CLI/harness as lego.

    python scripts/make_synth_scene.py --out /tmp/synth_armadillo \
        --obj /root/reference/data/obj/armadillo.obj --views 48 --res 400
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--obj", default="/root/reference/data/obj/armadillo.obj")
    ap.add_argument("--views", type=int, default=48)
    ap.add_argument("--res", type=int, default=400)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=1999)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from synerfgine_tpu.core.camera import look_at, ngp_matrix_to_nerf, pixel_grid_uv
    from synerfgine_tpu.core.types import Ray
    from synerfgine_tpu.geometry.obj import load_obj
    from synerfgine_tpu.grid.occupancy import OccupancyGrid
    from synerfgine_tpu.hybrid.raytracer import RayTracer
    from synerfgine_tpu.hybrid.scene import Light, Material, Scene, VirtualObject
    from synerfgine_tpu.train.nerf_trainer import scene_aabb

    tris = load_obj(args.obj)
    # normalize into the unit cube around 0.5 (NGP scene box)
    lo, hi = tris.reshape(-1, 3).min(0), tris.reshape(-1, 3).max(0)
    center = (lo + hi) / 2
    scale = 0.6 / max(hi - lo)
    tris = (tris - center) * scale + 0.5
    print(f"{len(tris)} triangles", flush=True)

    obj = VirtualObject(id=0, triangles=np.asarray(tris, np.float32),
                        pos=np.zeros(3), rot=np.eye(3), scale=1.0,
                        material_id=0)
    scene = Scene(objects=[obj],
                  materials=[Material(0, [0.75, 0.55, 0.35], n=16.0)],
                  lights=[Light(0, [1.2, 2.2, 0.8], intensity=1.1,
                                size=0.05)])
    world = scene.pack_device()
    grid = OccupancyGrid(1)
    aabb = scene_aabb(1)
    bitfield = jnp.zeros((1, 128, 128, 128), bool)  # no NeRF shadows
    tracer = RayTracer(grid, aabb, samples=2, bounces=2, shadow_samples=2)

    out = pathlib.Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    W = H = args.res
    fl = 1.1 * W
    uv = jnp.asarray(np.asarray(pixel_grid_uv(W, H)).reshape(-1, 2))
    frames = []
    key = jax.random.PRNGKey(args.seed)

    trace = jax.jit(lambda o, d, k: tracer._trace_impl(o, d, world,
                                                       bitfield, k))
    for i in range(args.views):
        a = 2 * np.pi * i / args.views
        el = 0.25 + 0.35 * ((i * 7) % args.views) / args.views
        eye = np.array([0.5 + 1.3 * np.cos(a) * np.cos(el),
                        0.5 + 1.3 * np.sin(el),
                        0.5 + 1.3 * np.sin(a) * np.cos(el)])
        cm = look_at(eye, [0.5, 0.5, 0.5])
        d_cam = np.stack([(np.asarray(uv[:, 0]) - 0.5) * W / fl,
                          (np.asarray(uv[:, 1]) - 0.5) * H / fl,
                          np.ones(W * H)], -1)
        d = d_cam @ cm[:, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(cm[:, 3], d.shape)
        key, k = jax.random.split(key)
        res = trace(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), k)
        rgb = np.clip(np.asarray(res.rgb), 0, 1).reshape(H, W, 3)
        alpha = np.asarray(res.hit).reshape(H, W).astype(np.float32)
        rgba = np.concatenate([rgb, alpha[..., None]], -1)
        name = f"images/r_{i:03d}.png"
        Image.fromarray((rgba * 255).astype(np.uint8)).save(out / name)
        # transforms.json wants the NeRF-convention matrix; the loader
        # will convert back with nerf_matrix_to_ngp
        m = np.eye(4)
        m[:3, :4] = ngp_matrix_to_nerf(cm)
        frames.append({"file_path": name, "transform_matrix": m.tolist()})
        print(f"view {i + 1}/{args.views}", flush=True)

    meta = {"camera_angle_x": float(2 * np.arctan(W / (2 * fl))),
            "fl_x": fl, "fl_y": fl, "cx": W / 2, "cy": H / 2,
            "aabb_scale": 1, "frames": frames}
    (out / "transforms.json").write_text(json.dumps(meta, indent=1))
    print(f"wrote {args.views} views to {out}")


if __name__ == "__main__":
    main()
