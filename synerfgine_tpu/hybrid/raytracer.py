"""Synthetic-object path tracer with NeRF shadows — TPU-native.

Capability match for `sng::RayTracer` (src/synerfgine/raytracer.cu):
- distribution ray tracing: `light_samples` primary samples jittered in a
  lens cone, `path_trace_depth` bounces, per-light `shadow_samples`
  area-light samples (raytracer.cu:124-218);
- shading: Blinn-Phong-style `local_color` + ambient ka, shadow =
  min(mesh-occlusion depth, NeRF-occupancy depth, light distance) mapped
  through smoothstep^shadow_factor (shade_object, raytracer.cu:6-57);
- `depth_test_nerf`: distance to the first occupied occupancy-grid voxel
  toward the light (synerfgine/common.cu:69-168) — vectorized here as a
  fixed ladder of exponential-stepping occupancy probes instead of a
  serial DDA;
- scatter: cone sample around the normal (angle spec_angle for glossy,
  pi/2 for lambertian), pdf = 1/max(1, 2*spec_angle), attenuation rg
  (material.cuh:112-123);
- G-buffer outputs matching `ImgBufferType` (raytracer.cuh:20-31);
- temporal 50/50 accumulation (raytracer.cu:212-215) done by the Engine.

The whole tracer is one jitted dense tensor program per pixel chunk: the
reference's per-thread loops become `lax.scan`s over the sample counts
with (R, T)-batched intersection tests. Scanning (rather than unrolling)
the light-sample and shadow-sample loops keeps the compiled program a
constant size regardless of the scene's sample settings — the armadillo
scene's light_samples=8 x shadow_samples=8 x bounces=2 x 3 lights would
otherwise unroll ~384 BVH traversals + occupancy ladders into one XLA
program, which RESOURCE_EXHAUSTed the TPU backend at compile time in
round 4 (docs/experiments/hybrid_oom_r4.md). Only the bounce loop stays
unrolled (path_trace_depth is 2 in every shipped scene, and bounce 0
carries extra G-buffer accumulation).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import BoundingBox, Ray
from ..grid.occupancy import OccupancyGrid
from ..march.dda import from_stepping_space, to_stepping_space
from ..geometry.triangle import ray_triangles_intersect, triangle_normals

MAX_DEPTH = 16384.0
MIN_DEPTH = 1e-4


def smoothstep(x):
    x = jnp.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def _basis(n):
    """Orthonormal tangent basis for unit normals n (..., 3)."""
    a = jnp.where(jnp.abs(n[..., :1]) > 0.9,
                  jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t1 = jnp.cross(n, jnp.broadcast_to(a, n.shape))
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def cone_random(axis, longi, latid):
    """Random direction at polar angle `longi` around `axis`
    (sng::cone_random behavior)."""
    t1, t2 = _basis(axis)
    s, c = jnp.sin(longi)[..., None], jnp.cos(longi)[..., None]
    return c * axis + s * (jnp.cos(latid)[..., None] * t1 +
                           jnp.sin(latid)[..., None] * t2)


def reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n


class TraceResult(NamedTuple):
    rgb: jnp.ndarray
    depth: jnp.ndarray
    normal: jnp.ndarray
    src_pos: jnp.ndarray
    next_pos: jnp.ndarray
    src_dir: jnp.ndarray
    next_dir: jnp.ndarray
    nerf_shadow: jnp.ndarray
    hit: jnp.ndarray


class RayTracer:
    """Static settings captured at construction; `trace` is jit-cached."""

    def __init__(self, grid: OccupancyGrid, aabb: BoundingBox,
                 samples: int = 2, bounces: int = 2, shadow_samples: int = 2,
                 n_shadow_steps: int = 64, lens_size: float = 0.009,
                 depth_offset: float = 0.1, shadow_factor: float = 1.0,
                 cone_angle: float = 1.0 / 256.0, show_nerf_shadow: bool = True):
        self.grid = grid
        self.aabb = aabb
        self.samples = samples
        self.bounces = bounces
        self.shadow_samples = shadow_samples
        self.n_shadow_steps = n_shadow_steps
        self.lens_size = lens_size
        self.depth_offset = depth_offset
        self.shadow_factor = shadow_factor
        self.cone_angle = cone_angle
        self.show_nerf_shadow = show_nerf_shadow
        self._trace = jax.jit(self._trace_impl)

    # ------------------------------------------------------------ queries
    def _intersect(self, o, d, world):
        """(t, tri_idx): BVH traversal when the packed world carries node
        arrays (> BRUTE_FORCE_MAX_TRIS, scene.pack_device), else the
        dense (R, T) brute force — the reference always traverses its
        per-object BVHs (ray_intersect_nodes, triangle_bvh.cu:264-319);
        for the <= 4k-tri shipped scenes brute force is faster on TPU."""
        if "bvh_lo" in world:
            from ..geometry.bvh import bvh_traverse

            nodes = {"lo": world["bvh_lo"], "hi": world["bvh_hi"],
                     "left": world["bvh_left"], "right": world["bvh_right"],
                     "first": world["bvh_first"], "count": world["bvh_count"],
                     "tris": world["tris"]}
            t, tri, _, _ = bvh_traverse(nodes, o, d)
            return t, tri
        t, tri, _, _ = ray_triangles_intersect(o, d, world["tris"])
        return t, tri

    def _closest_hit(self, o, d, world):
        t, tri = self._intersect(o + d * MIN_DEPTH, d, world)
        hit = tri >= 0
        tri_safe = jnp.maximum(tri, 0)
        normals = triangle_normals(world["tris"])[tri_safe]
        # flip normals to face the incoming ray (two-sided shading)
        facing = jnp.sum(normals * d, -1) < 0
        normals = jnp.where(facing[:, None], normals, -normals)
        mat = world["tri_mat"][tri_safe]
        pos = o + d * jnp.where(hit, t, MAX_DEPTH)[:, None]
        return hit, jnp.where(hit, t, MAX_DEPTH), pos, normals, mat

    def _occlusion_depth_world(self, o, d, world):
        """Distance to the nearest object hit (MAX_DEPTH if none)."""
        t, tri = self._intersect(o + d * MIN_DEPTH, d, world)
        return jnp.where(tri >= 0, t, MAX_DEPTH)

    def nerf_occlusion_depth(self, o, d, bitfield, full_d):
        """Distance to the first occupied occupancy voxel along d
        (depth_test_nerf, synerfgine/common.cu:69-96). The reference's
        serial skip-DDA becomes n_shadow_steps occupancy probes whose
        stepping-space ladder is scaled per-ray to span [0, full_d] —
        denser near the origin when cone_angle > 0 (contact shadows),
        uniform when cone_angle == 0."""
        n_max = to_stepping_space(full_d, self.cone_angle)   # (R,)
        frac = (jnp.arange(self.n_shadow_steps) + 0.5) / self.n_shadow_steps
        n = n_max[:, None] * frac[None, :]
        t = from_stepping_space(n, self.cone_angle)          # (R, K)
        # component planes (R, K) — no (R, K, 3) minor-dim-3 tensors;
        # see occupied_at_xyz for why this matters on the VPU
        px = o[:, 0:1] + d[:, 0:1] * t
        py = o[:, 1:2] + d[:, 1:2] * t
        pz = o[:, 2:3] + d[:, 2:3] * t
        occ = self.grid.occupied_at_xyz(bitfield, px, py, pz)
        lo, hi = self.aabb.lo, self.aabb.hi
        inside = ((px >= lo[0]) & (px <= hi[0]) & (py >= lo[1])
                  & (py <= hi[1]) & (pz >= lo[2]) & (pz <= hi[2]))
        occ = occ & inside
        t_hit = jnp.min(jnp.where(occ, t, MAX_DEPTH), axis=1)
        return jnp.minimum(t_hit, full_d)

    # ------------------------------------------------------------- shading
    def _local_color(self, L, N, R, V, kd, ks, n_exp, intensity):
        diff = jnp.maximum(0.0, jnp.sum(L * N, -1))[:, None] * kd * intensity[:, None]
        spec = jnp.power(jnp.maximum(0.0, jnp.sum(R * V, -1)), n_exp)[:, None] * ks
        return diff + spec

    def _shade(self, wi, hit, pos, normal, mat_id, world, bitfield, key):
        """Direct lighting at hit points; returns (color, nerf_shadow_min).

        The shadow-sample loop is a `lax.scan` (one compiled body reused
        `shadow_samples` times); lights stay a Python loop — the shipped
        scenes carry 2-3 and each light type needs its own shadow rule."""
        kd = world["mat_kd"][mat_id]
        ks = world["mat_ks"][mat_id]
        ka = world["mat_ka"][mat_id]
        n_exp = world["mat_n"][mat_id]
        R_count = pos.shape[0]
        n_lights = world["light_pos"].shape[0]
        V = -wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-12)
        sample_keys = jax.random.split(
            key, self.shadow_samples * n_lights
        ).reshape(self.shadow_samples, n_lights, -1)

        def one_shadow_sample(carry, keys_l):
            color, nerf_shadow_min = carry
            for l in range(n_lights):
                lpos0 = world["light_pos"][l]
                lsize = world["light_size"][l]
                lint = jnp.full(R_count, world["light_intensity"][l])
                is_point = world["light_type"][l] == 0
                offset = jax.random.uniform(keys_l[l], (R_count, 3)) * lsize
                lpos = lpos0 + offset
                Lvec = lpos - pos
                dist = jnp.linalg.norm(Lvec, axis=-1)
                L = Lvec / jnp.maximum(dist[:, None], 1e-12)
                syn_sh = self._occlusion_depth_world(pos, L, world)
                nerf_sh = self.nerf_occlusion_depth(pos, L, bitfield, dist + 1.0)
                nerf_shadow_min = jnp.minimum(
                    nerf_shadow_min, nerf_sh / jnp.maximum(dist, 1e-12))
                shadow = jnp.minimum(jnp.minimum(nerf_sh, syn_sh), dist)
                mask = smoothstep(
                    shadow / jnp.maximum(dist, 1e-12)) ** self.shadow_factor
                if not self.show_nerf_shadow:
                    mask = jnp.ones_like(mask)
                Rv = reflect(L, normal)
                lc = self._local_color(L, normal, Rv, V, kd, ks, n_exp, lint)
                # directional lights skip shadowing (raytracer.cu:39-50)
                contrib = jnp.where(is_point, lc * mask[:, None], lc)
                color = color + contrib
            return (color, nerf_shadow_min), None

        (color, nerf_shadow_min), _ = jax.lax.scan(
            one_shadow_sample,
            (jnp.zeros((R_count, 3)), jnp.full(R_count, MAX_DEPTH)),
            sample_keys)
        color = color / self.shadow_samples + ka
        return jnp.where(hit[:, None], color, 0.0), nerf_shadow_min

    def _scatter(self, pos, normal, mat_id, world, key):
        spec_angle = world["mat_spec_angle"][mat_id]
        rg = world["mat_rg"][mat_id]
        k1, k2 = jax.random.split(key)
        longi = jax.random.uniform(k1, pos.shape[:1]) * spec_angle
        latid = jax.random.uniform(k2, pos.shape[:1]) * 2.0 * jnp.pi
        new_dir = cone_random(normal, longi, latid)
        pdf = 1.0 / jnp.maximum(1.0, spec_angle * 2.0)
        return Ray(pos, new_dir), pdf, rg

    # --------------------------------------------------------------- trace
    def _trace_impl(self, o, d, world, bitfield, key):
        R = o.shape[0]
        spp_keys = jax.random.split(key, self.samples)

        def one_light_sample(carry, k_spp):
            (shade, normal_acc, next_pos_acc, next_dir_acc, src_dir_acc,
             nerf_shadow, first_hit, first_depth) = carry
            k1, k2, kb = jax.random.split(k_spp, 3)
            longi = jax.random.uniform(k1, (R,)) * self.lens_size
            latid = jax.random.uniform(k2, (R,)) * 2.0 * jnp.pi
            ray_o, ray_d = o, cone_random(d, longi, latid)
            pdf = jnp.full(R, 1.0 / self.bounces)
            atten = jnp.ones(R)
            alive = jnp.ones(R, bool)
            shade_s = jnp.zeros((R, 3))
            for bounce in range(self.bounces):
                kb, ksh, ksc = jax.random.split(kb, 3)
                hit, t, pos, normal, mat_id = self._closest_hit(
                    ray_o, ray_d, world)
                t = t + self.depth_offset
                if bounce == 0:
                    normal_acc = normal_acc + jnp.where(hit[:, None], normal, 0.0)
                    next_pos_acc = next_pos_acc + pos
                    src_dir_acc = src_dir_acc + ray_d
                    first_hit = first_hit | hit
                    first_depth = jnp.minimum(
                        first_depth, jnp.where(hit, t, MAX_DEPTH))
                alive = alive & hit
                color, nsh = self._shade(
                    ray_d, alive, pos, normal, mat_id, world, bitfield, ksh)
                nerf_shadow = jnp.minimum(
                    nerf_shadow, jnp.where(alive, nsh, 1.0))
                shade_s = shade_s + color * (pdf * atten)[:, None]
                new_ray, new_pdf, rg = self._scatter(
                    pos, normal, mat_id, world, ksc)
                if bounce == 0:
                    next_dir_acc = next_dir_acc + new_ray.d
                ray_o, ray_d = new_ray.o, new_ray.d
                pdf, atten = new_pdf, atten * rg
            shade = shade + shade_s
            return (shade, normal_acc, next_pos_acc, next_dir_acc,
                    src_dir_acc, nerf_shadow, first_hit, first_depth), None

        carry0 = (jnp.zeros((R, 3)), jnp.zeros((R, 3)), jnp.zeros((R, 3)),
                  jnp.zeros((R, 3)), jnp.zeros((R, 3)), jnp.full(R, 1.0),
                  jnp.zeros(R, bool), jnp.full(R, MAX_DEPTH))
        (shade, normal_acc, next_pos_acc, next_dir_acc, src_dir_acc,
         nerf_shadow, first_hit, first_depth), _ = jax.lax.scan(
            one_light_sample, carry0, spp_keys)
        w = float(self.samples)
        shade = shade / w
        normal_acc = normal_acc / w
        next_pos_acc = next_pos_acc / w
        next_dir_acc = next_dir_acc / w
        src_dir_acc = src_dir_acc / w
        depth = jnp.sum(d * (next_pos_acc - o), axis=-1)
        depth = jnp.where(first_hit, depth, MAX_DEPTH)
        return TraceResult(
            rgb=shade, depth=depth, normal=normal_acc, src_pos=o,
            next_pos=next_pos_acc, src_dir=src_dir_acc, next_dir=next_dir_acc,
            nerf_shadow=nerf_shadow, hit=first_hit,
        )

    def trace(self, rays: Ray, world: dict, bitfield, key) -> TraceResult:
        return self._trace(rays.o, rays.d, world, bitfield, key)

    def buffer_view(self, result: TraceResult, buffer_type: str) -> jnp.ndarray:
        """ImgBufferType debug views (raytracer.cu:189-216). Vectors are
        mapped to colors as 0.5*(v+1)."""
        v2c = lambda v: 0.5 * (v + 1.0)
        bt = buffer_type.lower()
        if bt == "normal":
            return v2c(result.normal)
        if bt == "nextdirection":
            return v2c(result.next_dir)
        if bt == "srcdirection":
            return v2c(result.src_dir)
        if bt == "nextorigin":
            norm = result.next_pos / jnp.maximum(
                jnp.linalg.norm(result.next_pos, axis=-1, keepdims=True), 1e-12)
            return jnp.where(result.hit[:, None], v2c(norm), 0.0)
        if bt == "srcorigin":
            norm = result.src_pos / jnp.maximum(
                jnp.linalg.norm(result.src_pos, axis=-1, keepdims=True), 1e-12)
            return v2c(norm)
        if bt == "depth":
            return jnp.broadcast_to(result.depth[:, None], result.rgb.shape)
        if bt == "nerfshadow":
            return jnp.broadcast_to(result.nerf_shadow[:, None], result.rgb.shape)
        return result.rgb  # Final
