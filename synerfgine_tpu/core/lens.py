"""Camera lens models: OpenCV / fisheye / F-theta / latlong / equirect.

Capability match for the reference's `Lens` support in ray generation
(include/neural-graphics-primitives/common.h:188-205 `ELensMode`/`Lens`;
common_device.cuh:250-340 distortion deltas + iterative undistortion;
common_device.cuh:403-505 `uv_to_ray`/`pos_to_uv` lens paths).

TPU-native design: the reference undistorts with a per-pixel scalar
Newton loop (100 iterations, early exit). Here the whole pixel batch runs
a fixed-count vectorized Newton iteration inside jit — the Jacobian of
the distortion delta comes from two `jax.jvp` calls (exact, no finite
differences), and 20 iterations exceed fp32 fixed-point for all sane
coefficient magnitudes (reference uses |step| < 1e-10 as its stop).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

LENS_MODES = ("perspective", "opencv", "opencv_fisheye", "ftheta",
              "latlong", "equirectangular")


@dataclasses.dataclass(frozen=True)
class Lens:
    """mode + up to 7 params (meaning depends on mode, like the
    reference's float params[7]):
    - opencv: k1 k2 p1 p2
    - opencv_fisheye: k1 k2 k3 k4
    - ftheta: r0 r1 r2 r3 r4 resx resy
    """
    mode: str = "perspective"
    params: tuple = ()

    def __post_init__(self):
        if self.mode not in LENS_MODES:
            raise ValueError(f"unknown lens mode {self.mode!r}")

    @property
    def is_distorted(self) -> bool:
        return self.mode != "perspective"


def opencv_delta(params, u, v):
    """Forward OpenCV radial+tangential distortion displacement
    (common_device.cuh:250-263)."""
    k1, k2, p1, p2 = params[0], params[1], params[2], params[3]
    u2, v2, uv = u * u, v * v, u * v
    r2 = u2 + v2
    radial = k1 * r2 + k2 * r2 * r2
    du = u * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u2)
    dv = v * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v2)
    return du, dv


def fisheye_delta(params, u, v):
    """Forward OpenCV fisheye distortion displacement
    (common_device.cuh:266-288)."""
    k1, k2, k3, k4 = params[0], params[1], params[2], params[3]
    r = jnp.sqrt(u * u + v * v)
    safe_r = jnp.maximum(r, 1e-12)
    theta = jnp.arctan(safe_r)
    t2 = theta * theta
    thetad = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = jnp.where(r > 1e-12, thetad / safe_r - 1.0, 0.0)
    return u * scale, v * scale


def iterative_undistort(params, u, v, delta_fn, iters: int = 20):
    """Solve x + delta(x) = x0 for x by vectorized Newton iteration
    (the reference's iterative_lens_undistortion, but with exact jvp
    Jacobians and a fixed jit-friendly iteration count)."""
    params = jnp.asarray(params, jnp.float32)
    x0 = jnp.stack([u, v], axis=-1)

    def f(x):
        du, dv = delta_fn(params, x[..., 0], x[..., 1])
        return x + jnp.stack([du, dv], axis=-1)

    def body(_, x):
        # residual + exact Jacobian columns via two jvp evaluations
        r = f(x) - x0
        e0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0]), x.shape)
        e1 = jnp.broadcast_to(jnp.asarray([0.0, 1.0]), x.shape)
        _, j0 = jax.jvp(f, (x,), (e0,))   # d f / d u
        _, j1 = jax.jvp(f, (x,), (e1,))   # d f / d v
        a, c = j0[..., 0], j0[..., 1]
        b, d = j1[..., 0], j1[..., 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        step_u = (d * r[..., 0] - b * r[..., 1]) / det
        step_v = (a * r[..., 1] - c * r[..., 0]) / det
        return x - jnp.stack([step_u, step_v], axis=-1)

    x = jax.lax.fori_loop(0, iters, body, x0)
    return x[..., 0], x[..., 1]


def ftheta_undistort(uv_centered, params):
    """F-theta polynomial lens -> camera-space direction
    (common_device.cuh:370-392 f_theta_undistortion). params:
    r0 r1 r2 r3 r4 resx resy. Invalid pixels return a zero direction."""
    p = jnp.asarray(params, jnp.float32)
    xpix = uv_centered[..., 0] * p[5]
    ypix = uv_centered[..., 1] * p[6]
    norm = jnp.sqrt(xpix * xpix + ypix * ypix)
    alpha = p[0] + norm * (p[1] + norm * (p[2] + norm * (p[3] + norm * p[4])))
    sin_a, cos_a = jnp.sin(alpha), jnp.cos(alpha)
    ok = (cos_a > 1e-30) & (norm > 0)
    inv = jnp.where(norm > 0, 1.0 / jnp.maximum(norm, 1e-12), 0.0)
    dir_ = jnp.stack([sin_a * inv * xpix, sin_a * inv * ypix, cos_a], -1)
    return jnp.where(ok[..., None], dir_, 0.0)


def latlong_to_dir(uv):
    """(common_device.cuh:394-401)"""
    theta = (uv[..., 1] - 0.5) * jnp.pi
    phi = (uv[..., 0] - 0.5) * 2.0 * jnp.pi
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    return jnp.stack([sp * ct, st, cp * ct], -1)


def equirectangular_to_dir(uv):
    """(common_device.cuh:403-410)"""
    ct = (uv[..., 1] - 0.5) * 2.0
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = (uv[..., 0] - 0.5) * 2.0 * jnp.pi
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    return jnp.stack([sp * st, ct, cp * st], -1)


def lens_ray_dir(uv, resolution, focal_length, principal_point, lens: Lens):
    """Screen uv -> camera-space (unnormalized) ray direction with the
    lens model applied — the lens branch of uv_to_ray
    (common_device.cuh:428-455). focal_length/principal_point may be
    per-ray ((..., 2)) or shared ((2,))."""
    res = jnp.asarray(resolution, jnp.float32)
    fl = jnp.asarray(focal_length, jnp.float32)
    pp = jnp.asarray(principal_point, jnp.float32)
    if lens.mode == "ftheta":
        return ftheta_undistort(uv - pp, lens.params)
    if lens.mode == "latlong":
        return latlong_to_dir(uv)
    if lens.mode == "equirectangular":
        return equirectangular_to_dir(uv)
    u = (uv[..., 0] - pp[..., 0]) * res[0] / fl[..., 0]
    v = (uv[..., 1] - pp[..., 1]) * res[1] / fl[..., 1]
    if lens.mode == "opencv":
        u, v = iterative_undistort(lens.params, u, v, opencv_delta)
    elif lens.mode == "opencv_fisheye":
        u, v = iterative_undistort(lens.params, u, v, fisheye_delta)
    return jnp.stack([u, v, jnp.ones_like(u)], axis=-1)


def lens_distort_uv(dir_cam, resolution, focal_length, principal_point,
                    lens: Lens):
    """Camera-space direction -> screen uv with forward distortion — the
    lens branch of pos_to_uv (common_device.cuh:507-560). Perspective /
    OpenCV / fisheye only (the reference's pos_to_uv supports the same
    subset for projection)."""
    res = jnp.asarray(resolution, jnp.float32)
    fl = jnp.asarray(focal_length, jnp.float32)
    pp = jnp.asarray(principal_point, jnp.float32)
    z = dir_cam[..., 2]
    u = dir_cam[..., 0] / z
    v = dir_cam[..., 1] / z
    if lens.mode == "opencv":
        du, dv = opencv_delta(jnp.asarray(lens.params, jnp.float32), u, v)
        u, v = u + du, v + dv
    elif lens.mode == "opencv_fisheye":
        du, dv = fisheye_delta(jnp.asarray(lens.params, jnp.float32), u, v)
        u, v = u + du, v + dv
    elif lens.mode != "perspective":
        raise NotImplementedError(f"pos_to_uv with lens {lens.mode}")
    uu = u * fl[..., 0] / res[0] + pp[..., 0]
    vv = v * fl[..., 1] / res[1] + pp[..., 1]
    return jnp.stack([uu, vv], axis=-1)


def lens_from_transforms(meta: dict) -> Lens:
    """Build a Lens from transforms.json fields (nerf_loader.cu:196-250
    parsing: k1/k2/p1/p2 -> OpenCV; "is_fisheye" switches to the fisheye
    model; latlong/ftheta via explicit camera_model)."""
    model = str(meta.get("camera_model", "")).lower()
    if model in ("latlong",):
        return Lens("latlong")
    if model in ("equirectangular",):
        return Lens("equirectangular")
    k1 = float(meta.get("k1", 0.0))
    k2 = float(meta.get("k2", 0.0))
    p1 = float(meta.get("p1", 0.0))
    p2 = float(meta.get("p2", 0.0))
    k3 = float(meta.get("k3", 0.0))
    k4 = float(meta.get("k4", 0.0))
    if meta.get("is_fisheye") or model == "opencv_fisheye":
        if any((k1, k2, k3, k4)):
            return Lens("opencv_fisheye", (k1, k2, k3, k4))
        return Lens("perspective")
    if any((k1, k2, p1, p2)):
        return Lens("opencv", (k1, k2, p1, p2))
    return Lens("perspective")
