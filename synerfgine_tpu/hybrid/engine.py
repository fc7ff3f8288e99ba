"""Hybrid engine: NeRF + path-traced synthetic objects with mutual shadows.

Capability match for `sng::Engine` (src/synerfgine/engine.cu) — headless:
frame orchestration (engine.cu:352-433 call order, SURVEY.md §3.1), the
resolution cascade (NeRF at res_factor-scaled size, synthetic at
vo_scale x that; engine.cu:236-255), dirty-tracked world re-upload,
camera-path replay with fps pacing and `end_on_loop`, temporal 50/50
accumulation, and PNG frame recording (the Display's fragment-shader blit
is replaced by the same math in the overlay kernel: depth-select,
exposure, tonemap, sRGB — raytracer.cu:220-258 `overlay_nerf`).

The NeRF pass consumes the synthetic depth buffer: marching past the
nearest synthetic surface is masked out (`trace_alt` /
`generate_next_nerf_network_inputs_alt` semantics,
testbed_nerf.cu:424-474, 2128-2277).
"""
from __future__ import annotations

import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..core.constants import RENDER_MIN_TRANSMITTANCE, PT_SEED
from ..core.types import Ray
from ..grid.occupancy import OccupancyGrid, OccupancyGridState
from ..march.windowed import render_march_windowed
from ..nn.nerf_network import NerfNetwork, NerfParams
from ..io.image import linear_to_srgb, write_image
from ..render.tonemap import tonemap
from .nerf_shadows import (
    box_filter,
    normals_from_positions,
    positions_from_depth,
    shadow_map,
)
from .raytracer import MAX_DEPTH, RayTracer
from .scene import Scene


class Engine:
    def __init__(
        self,
        network: NerfNetwork,
        params: NerfParams,
        grid: OccupancyGrid,
        grid_state: OccupancyGridState,
        scene: Scene,
        width: int = 640,
        height: int = 360,
        aabb=None,
    ):
        from ..train.nerf_trainer import scene_aabb

        self.network = network
        self.params = params
        self.grid = grid
        self.grid_state = grid_state
        self.scene = scene
        self.width = width
        self.height = height
        self.aabb = aabb if aabb is not None else scene_aabb(grid.aabb_scale)

        s = scene.settings
        # resolution cascade: NeRF at (8 / res_factor) of the window,
        # synthetic at vo_scale x NeRF res, both capped at the window.
        f = min(1.0, 8.0 / max(s.res_factor, 1))
        self.nerf_res = (max(16, int(width * f)) // 2 * 2,
                         max(16, int(height * f)) // 2 * 2)
        self.syn_res = (min(width, self.nerf_res[0] * s.vo_scale),
                        min(height, self.nerf_res[1] * s.vo_scale))

        self.tracer = RayTracer(
            grid, self.aabb,
            samples=s.light_samples, bounces=s.path_trace_depth,
            shadow_samples=s.shadow_samples, lens_size=s.lens_size,
            depth_offset=s.depth_offset, shadow_factor=s.shadow_factor,
            show_nerf_shadow=s.shadow_on_virtual_obj,
            # the reference's n_steps counts skip-DDA iterations over
            # OCCUPIED voxels (default m_n_steps=8, raytracer.cuh:158 —
            # spatial resolution unbounded because empty space is
            # DDA-advanced); our vectorized ladder counts FIXED probes
            # over [0, light_d], so 8 probes per reference step keeps
            # comparable shadow resolution (64 at the default)
            n_shadow_steps=8 * max(1, s.n_shadow_steps),
        )
        self.world = scene.pack_device()
        self.key = jax.random.PRNGKey(PT_SEED)
        self.frame_idx = 0
        self._acc_rgba = None
        self._acc_cam = None
        self._paired_tbl = jax.jit(
            self.network.pos_encoding.make_paired_table)
        self._skip_tbl = jax.jit(self.grid.make_skip_grid)
        self._nerf_chunk = jax.jit(self._render_nerf_chunk,
                                   static_argnums=(8,))
        self._syn_chunk = jax.jit(self._render_syn_chunk,
                                  static_argnums=(5,))
        self._shadow_chunk = jax.jit(self._shadow_map_chunk)
        self.timings: dict[str, float] = {}

        # dynamic resolution (testbed.cu:2909-2971): scale the NeRF pass
        # to hold `dynamic_res_target_fps`; factor quantized to sqrt(2)
        # buckets so jit recompiles stay bounded
        self.dynamic_res = False
        self.dynamic_res_target_fps = 20.0
        self._res_factor_idx = 0          # 0 = full res; each +1 = /sqrt(2)
        self._frame_ms_ema = 30.0
        self._base_nerf_res = self.nerf_res

    def _update_dynamic_res(self):
        target_ms = 1000.0 / self.dynamic_res_target_fps
        if self._frame_ms_ema > target_ms * 1.15 and self._res_factor_idx < 6:
            self._res_factor_idx += 1
        elif self._frame_ms_ema < target_ms * 0.5 and self._res_factor_idx > 0:
            self._res_factor_idx -= 1
        s = 2.0 ** (-self._res_factor_idx / 2.0)
        w0, h0 = self._base_nerf_res
        self.nerf_res = (max(16, int(w0 * s)) // 2 * 2,
                         max(16, int(h0 * s)) // 2 * 2)

    # ------------------------------------------------------------- camera
    def current_camera(self):
        sc = self.scene
        if sc.cam_path is not None:
            m, zoom = sc.cam_path.eval_frame(self.frame_idx)
            return np.asarray(m, np.float32), zoom
        view = sc.default_view if sc.default_view is not None else np.array([0.0, 0.0, -1.0])
        at = sc.default_at if sc.default_at is not None else np.array([0.5, 0.5, 0.5])
        # reference semantics: scene "view" is the view DIRECTION and
        # "zoom" is the eye distance (a dolly, not a focal scale) —
        # eye = at - dir * zoom (set_view_dir/set_look_at/set_scale,
        # testbed.cu:405-425; the round-4 form put the eye at distance 1
        # and scaled the focal instead, framing the armadillo out of
        # every shipped scene's default camera)
        eye = at - view / np.linalg.norm(view) * sc.default_zoom
        return cam.look_at(eye, at), sc.default_zoom

    def _focal(self, res, zoom):
        # fixed fov 50.625 deg on the Y axis (set_fov(50.625f),
        # testbed.cu:480; m_fov_axis = 1, testbed.cu:471); zoom dollies
        # the camera (current_camera) and must not change the focal
        base = 0.5 * res[1] / np.tan(np.radians(50.625) / 2.0)
        return np.array([base, base], np.float32)

    # ----------------------------------------------------------- NeRF pass
    def _render_nerf_chunk(self, params, paired_tbl, bitfield, skip_tbl,
                           uv, cm, focal, t_max, res):
        """NeRF render stopping at the synthetic depth (trace_alt).
        `res` is static so dynamic resolution retraces correctly."""
        rays = cam.uv_to_ray(uv, cm, res, focal)
        d_norm = rays.d / jnp.linalg.norm(rays.d, axis=-1, keepdims=True)
        rays = Ray(rays.o, d_norm)
        dirs_warped = (d_norm + 1.0) * 0.5

        def net_apply(xs_c, dirs_c):
            xs_unit = jnp.clip(self.aabb.relative_pos(xs_c), 0.0, 1.0)
            return self.network.forward(params, xs_unit, dirs_c,
                                        paired_table=paired_tbl)

        # windowed march+compaction (no starvation under any budget);
        # t_max early-outs at the synthetic surface (alt marcher
        # semantics, testbed_nerf.cu:424-474)
        comp = render_march_windowed(
            rays, self.aabb, self.grid, bitfield, net_apply, 512,
            self.tracer.cone_angle, None, dirs_warped,
            window=64, budget=min(uv.shape[0] * 16, 1 << 16),
            min_transmittance=RENDER_MIN_TRANSMITTANCE, t_max=t_max,
            skip_grid=skip_tbl,
        )
        depth = jnp.where(comp.opacity > 0.01, comp.depth / jnp.maximum(comp.opacity, 1e-6), MAX_DEPTH)
        return comp.rgb, comp.opacity, depth, rays.o, d_norm

    def render_nerf(self, cm, zoom, syn_depth_lowres):
        w, h = self.nerf_res
        uv = np.stack(np.meshgrid(
            (np.arange(w, dtype=np.float32) + 0.5) / w,
            (np.arange(h, dtype=np.float32) + 0.5) / h), -1).reshape(-1, 2)
        focal = self._focal(self.nerf_res, zoom)
        # 16384-px chunks: same windowed-march physics as eval, where
        # this size measured 26% faster per view at identical PSNR
        # (docs/experiments/evalchunk_r5.json)
        chunk = 1 << 14
        outs = {"rgb": [], "alpha": [], "depth": [], "o": [], "d": []}
        t_max_flat = syn_depth_lowres.reshape(-1)
        n = uv.shape[0]
        pad = (-n) % chunk
        uv_p = np.concatenate([uv, np.zeros((pad, 2), np.float32)])
        t_p = jnp.concatenate([jnp.asarray(t_max_flat),
                               jnp.full((pad,), MAX_DEPTH)])
        # aligned-pair + skip tables built once per frame, not per chunk
        paired_tbl = self._paired_tbl(self.params.hash_table)
        skip_tbl = self._skip_tbl(self.grid_state.bitfield)
        for i in range(0, len(uv_p), chunk):
            rgb, a, dep, o, d = self._nerf_chunk(
                self.params, paired_tbl, self.grid_state.bitfield,
                skip_tbl, jnp.asarray(uv_p[i:i + chunk]), jnp.asarray(cm),
                jnp.asarray(focal), t_p[i:i + chunk], (w, h))
            outs["rgb"].append(rgb); outs["alpha"].append(a)
            outs["depth"].append(dep); outs["o"].append(o); outs["d"].append(d)
        cat = {k: jnp.concatenate(v)[:n] for k, v in outs.items()}
        return {
            "rgb": cat["rgb"].reshape(h, w, 3),
            "alpha": cat["alpha"].reshape(h, w),
            "depth": cat["depth"].reshape(h, w),
            "o": cat["o"].reshape(h, w, 3),
            "d": cat["d"].reshape(h, w, 3),
        }

    # ------------------------------------------------------ synthetic pass
    def _render_syn_chunk(self, uv, cm, focal, world, key, res, bitfield):
        """One jitted program per chunk: ray gen + path trace + debug-view
        select (keeping ray gen inside the jit avoids per-chunk eager
        dispatches through the device relay).

        NOTE: scene.settings (syn_filter here; shadow brightness/
        threshold in _shadow_map_chunk) are captured AT FIRST TRACE —
        engines are cheap, construct a new one per settings config (the
        exp_hybrid sweep pattern) rather than mutating settings on a
        live engine."""
        rays = cam.uv_to_ray(uv, cm, res, focal)
        d_norm = rays.d / jnp.linalg.norm(rays.d, axis=-1, keepdims=True)
        out = self.tracer._trace_impl(rays.o, d_norm, world, bitfield, key)
        view = self.tracer.buffer_view(out, self.scene.settings.syn_filter)
        return view, out.depth, out.hit

    def render_synthetic(self, cm, zoom, chunk: int = 1 << 13):
        """Path-trace the synthetic layer, chunked over pixels so large
        frames bound the (rays x triangles) intersection tensors.
        Chunk 8192: the full-settings trace program verified on the v5e
        chip up to 32768 rays and crashed the TPU worker at 65536
        (r5_hybrid_probe chunk64k); 8192 keeps the dense (R, T)
        brute-force temps ~100 MB with headroom at the armadillo's 995
        tris. For bigger BRUTE-FORCED scenes the chunk shrinks to hold
        the verified (rays x tris) pair count (~16M, half the 32.6M
        verified-good point); BVH-routed worlds don't build (R, T)."""
        n_tris = int(self.world["tris"].shape[0])
        if "bvh_lo" not in self.world:
            pair_budget = 16 << 20
            chunk = max(1 << 10, min(chunk, pair_budget // max(n_tris, 1)
                                     // 1024 * 1024))
        w, h = self.syn_res
        uv = np.stack(np.meshgrid(
            (np.arange(w, dtype=np.float32) + 0.5) / w,
            (np.arange(h, dtype=np.float32) + 0.5) / h), -1).reshape(-1, 2)
        focal = self._focal(self.syn_res, zoom)
        n = uv.shape[0]
        pad = (-n) % chunk
        uv_p = np.concatenate([uv, np.zeros((pad, 2), np.float32)])
        views, depths, hits = [], [], []
        for i in range(0, len(uv_p), chunk):
            self.key, k = jax.random.split(self.key)
            view, depth, hit = self._syn_chunk(
                jnp.asarray(uv_p[i:i + chunk]), jnp.asarray(cm),
                jnp.asarray(focal), self.world, k, (w, h),
                self.grid_state.bitfield)
            views.append(view)
            depths.append(depth)
            hits.append(hit)
        return {
            "rgb": jnp.concatenate(views)[:n].reshape(h, w, 3),
            "depth": jnp.concatenate(depths)[:n].reshape(h, w),
            "hit": jnp.concatenate(hits)[:n].reshape(h, w),
        }

    def _shadow_map_chunk(self, pos, nrm, world, bitfield, key):
        s = self.scene.settings
        return shadow_map(
            self.tracer, pos, nrm, world, bitfield, key,
            nerf_shadow_intensity=s.nerf_shadow_brightness,
            nerf_on_nerf_threshold=s.nerf_on_nerf_shadow_threshold)

    def nerf_shadow_map(self, pos, normals, chunk: int = 1 << 14):
        """Mesh-on-NeRF shadow factors, jitted and chunked (a 720p NeRF
        pass is ~1M points; one dispatch held (N, n_shadow_steps, 3)
        ladder temps that crowded the chip)."""
        p = pos.reshape(-1, 3)
        nv = normals.reshape(-1, 3)
        n = p.shape[0]
        pad = (-n) % chunk
        if pad:
            p = jnp.concatenate([p, jnp.zeros((pad, 3))])
            nv = jnp.concatenate([nv, jnp.ones((pad, 3))])
        outs = []
        for i in range(0, n + pad, chunk):
            self.key, k = jax.random.split(self.key)
            outs.append(self._shadow_chunk(
                p[i:i + chunk], nv[i:i + chunk], self.world,
                self.grid_state.bitfield, k))
        return jnp.concatenate(outs)[:n].reshape(pos.shape[:-1])

    # ------------------------------------------------------------ overlay
    def overlay(self, syn, nerf):
        """Depth-composite syn over NeRF, exposure + tonemap + sRGB
        (overlay_nerf, raytracer.cu:220-258)."""
        s = self.scene.settings
        sw, sh = self.syn_res
        # nearest-neighbor upsample to the synthetic resolution (handles
        # any ratio, incl. dynamic-resolution fractions)
        n_rgb = jax.image.resize(nerf["rgb"], (sh, sw, 3), "nearest")
        n_depth = jax.image.resize(nerf["depth"], (sh, sw), "nearest")
        # NeRF output rgb is sRGB-space (training space); syn shading is
        # linear. Convert NeRF to linear for the composite.
        from ..io.image import srgb_to_linear

        n_lin = srgb_to_linear(jnp.clip(n_rgb, 0.0, 1.0))
        syn_rgb = syn["rgb"]
        if s.fxaa:
            # the display shader FXAAs the synthetic layer before the
            # blit (main.frag:107 fxaa(syn_rgba, ...))
            from ..render.fxaa import fxaa as _fxaa

            syn_rgb = _fxaa(syn_rgb)
        use_syn = syn["hit"] & (syn["depth"] - s.depth_offset < n_depth) \
            if s.show_nerf else syn["hit"]
        if not s.show_virtual_obj:
            use_syn = jnp.zeros_like(use_syn)
        rgb = jnp.where(use_syn[..., None], syn_rgb, n_lin if s.show_nerf else 0.0)
        rgb = rgb * (2.0 ** s.exposure)
        rgb = tonemap(rgb, s.tonemap_curve)
        rgb = linear_to_srgb(jnp.clip(rgb, 0.0, 1.0))
        depth = jnp.where(use_syn, syn["depth"], n_depth)
        return rgb, depth

    # -------------------------------------------------------------- frame
    def frame(self) -> dict:
        import time

        t_start = time.time()
        s = self.scene.settings
        if self.dynamic_res and self.frame_idx > 0:
            self._update_dynamic_res()
        self.scene.next_frame()
        if self.scene.animation_speed > 0:
            self.world = self.scene.pack_device()
            self._acc_rgba = None  # world moved: reset accumulation
        cm, zoom = self.current_camera()

        t0 = time.time()
        syn = self.render_synthetic(cm, zoom)
        jax.block_until_ready(syn)   # honest per-phase attribution:
        # dispatches are async, so without a sync the next phase's first
        # host fetch absorbs this phase's device time (the r4 numbers
        # booked the whole syn pass under "nerf")
        self.timings["syn"] = time.time() - t0

        t0 = time.time()
        if s.show_nerf:
            # downsample syn depth to the NeRF res for the early-out
            sw, sh = self.syn_res
            nw, nh = self.nerf_res
            fy, fx = sh // nh, sw // nw
            sd = np.asarray(syn["depth"])[: nh * fy, : nw * fx]
            syn_depth_low = sd.reshape(nh, fy, nw, fx).min((1, 3))
            nerf = self.render_nerf(cm, zoom, syn_depth_low)
        else:
            nw, nh = self.nerf_res
            nerf = {
                "rgb": jnp.zeros((nh, nw, 3)), "alpha": jnp.zeros((nh, nw)),
                "depth": jnp.full((nh, nw), MAX_DEPTH),
                "o": jnp.zeros((nh, nw, 3)), "d": jnp.ones((nh, nw, 3)),
            }
        jax.block_until_ready(nerf)
        self.timings["nerf"] = time.time() - t0

        t0 = time.time()
        if s.show_nerf and s.shadow_on_nerf and self.scene.objects:
            pos = positions_from_depth(nerf["o"], nerf["d"], nerf["depth"])
            normals = normals_from_positions(pos)
            sh = self.nerf_shadow_map(pos, normals)
            sh = jnp.where(nerf["depth"] < MAX_DEPTH * 0.5, sh, 1.0)
            sh = box_filter(sh, s.smooth_kernel_size)
            sh = jnp.power(sh, s.nerf_shadow_brightness)
            nerf = {**nerf, "rgb": nerf["rgb"] * sh[..., None],
                    "shadow": sh}
        jax.block_until_ready(nerf)
        self.timings["nerf_shadow"] = time.time() - t0

        # nerf_filter debug views (ERenderMode subset: Shade default,
        # ShadowDepth / Depth / Normals probes, engine.cu:218-225)
        nf = s.nerf_filter.lower()
        if nf == "shadowdepth" and "shadow" in nerf:
            nerf = {**nerf,
                    "rgb": jnp.broadcast_to(nerf["shadow"][..., None],
                                            nerf["rgb"].shape)}
        elif nf == "depth":
            d = jnp.clip(nerf["depth"], 0.0, 4.0) / 4.0
            nerf = {**nerf, "rgb": jnp.broadcast_to(d[..., None],
                                                    nerf["rgb"].shape)}
        elif nf == "normals":
            pos = positions_from_depth(nerf["o"], nerf["d"], nerf["depth"])
            nerf = {**nerf,
                    "rgb": 0.5 * (normals_from_positions(pos) + 1.0)}

        rgb, depth = self.overlay(syn, nerf)

        # temporal 50/50 accumulation while the camera holds still
        cam_key = (tuple(np.asarray(cm).ravel().tolist()), zoom)
        if self._acc_rgba is not None and self._acc_cam == cam_key:
            rgb = 0.5 * rgb + 0.5 * self._acc_rgba
        self._acc_rgba = rgb
        self._acc_cam = cam_key

        self.frame_idx += 1
        if self.scene.cam_path is not None:
            self.scene.cam_path.frame_idx = self.frame_idx
        self.timings["frame"] = time.time() - t_start
        # EMA for the dynamic-resolution controller (seeded 30 ms like
        # m_render_ms, engine.cuh:97)
        self._frame_ms_ema = (0.9 * self._frame_ms_ema
                              + 0.1 * self.timings["frame"] * 1000.0)
        out = {"rgb": np.asarray(rgb), "depth": np.asarray(depth),
               "syn": syn, "nerf": nerf}

        if self.scene.record:
            folder = pathlib.Path(self.scene.output_folder)
            folder.mkdir(parents=True, exist_ok=True)
            write_image(str(folder / f"output-{self.frame_idx:03d}.png"),
                        out["rgb"])
        return out

    def finished(self) -> bool:
        cp = self.scene.cam_path
        if cp is None:
            return False
        if self.scene.img_count > 0 and self.frame_idx >= self.scene.img_count:
            return True
        return cp.end_on_loop and self.frame_idx >= cp.n_frames
