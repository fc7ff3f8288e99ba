"""Camera math: NGP camera-matrix convention, uv<->ray mapping, DOF.

Behavioral contract from the reference:
- `nerf_matrix_to_ngp` axis cycling + y/z flip + scale/offset
  (nerf_loader.h:101-168): NGP space cycles world axes (x,y,z)->(y,z,x),
  negates the camera's y and z basis vectors, and maps scene content into
  the unit cube via `t*scale + offset`.
- `uv_to_ray` pinhole + aperture sampling (common_device.cuh:403).
Camera matrices are stored row-major (3, 4): columns 0..2 = camera x/y/z
axes in world space, column 3 = position.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .types import Ray

# Camera math is tiny but accuracy-critical: force full fp32 on the MXU
# (TPU fp32 matmul otherwise defaults to bf16 passes => ~1e-3 uv error).
_PREC = jax.lax.Precision.HIGHEST


def nerf_matrix_to_ngp(m, scale: float = 0.33, offset=(0.5, 0.5, 0.5)):
    """Convert a (3,4) or (4,4) NeRF (OpenGL) c2w matrix to NGP convention.

    Row-permutes components (x,y,z)->(y,z,x), negates the y/z camera axes,
    and rescales the position into the unit cube.
    Works on numpy or jnp arrays; returns a (3, 4) array.
    """
    xp = jnp if isinstance(m, jnp.ndarray) else np
    m = m[:3, :4]
    perm = [1, 2, 0]
    r = m[perm, :]
    out = xp.stack(
        [r[:, 0], -r[:, 1], -r[:, 2], r[:, 3] * scale + xp.asarray(offset, dtype=r.dtype)],
        axis=1,
    )
    return out


def ngp_matrix_to_nerf(m, scale: float = 0.33, offset=(0.5, 0.5, 0.5)):
    """Inverse of `nerf_matrix_to_ngp`."""
    xp = jnp if isinstance(m, jnp.ndarray) else np
    m = m[:3, :4]
    inv_perm = [2, 0, 1]
    cols = [m[:, 0], -m[:, 1], -m[:, 2], (m[:, 3] - xp.asarray(offset, dtype=m.dtype)) / scale]
    r = xp.stack(cols, axis=1)
    return r[inv_perm, :]


def uv_to_ray(
    uv: jnp.ndarray,
    camera: jnp.ndarray,
    resolution,
    focal_length,
    principal_point=(0.5, 0.5),
    aperture_size: float = 0.0,
    focus_z: float = 1.0,
    aperture_uv: jnp.ndarray | None = None,
    lens=None,
) -> Ray:
    """Map screen uv in [0,1]^2 to world-space rays.

    uv: (..., 2); camera: (3, 4) NGP c2w. Directions are NOT normalized —
    like the reference, `t` parameterizes depth along the camera z axis so
    depth buffers compare directly. `lens` (core.lens.Lens) applies the
    OpenCV/fisheye/ftheta/latlong models of the reference's uv_to_ray
    (common_device.cuh:403-455).
    """
    res = jnp.asarray(resolution, jnp.float32)
    fl = jnp.asarray(focal_length, jnp.float32)
    pp = jnp.asarray(principal_point, jnp.float32)
    if lens is not None and lens.is_distorted:
        from .lens import lens_ray_dir

        d_cam = lens_ray_dir(uv, res, fl, pp, lens)
    else:
        d_cam = jnp.stack(
            [
                (uv[..., 0] - pp[0]) * res[0] / fl[0],
                (uv[..., 1] - pp[1]) * res[1] / fl[1],
                jnp.ones_like(uv[..., 0]),
            ],
            axis=-1,
        )
    if aperture_size > 0.0 and aperture_uv is not None:
        # Thin-lens: jitter the origin on the aperture disk, refocus at focus_z.
        r = jnp.sqrt(aperture_uv[..., 0])
        theta = 2.0 * jnp.pi * aperture_uv[..., 1]
        lens = aperture_size * jnp.stack(
            [r * jnp.cos(theta), r * jnp.sin(theta), jnp.zeros_like(r)], axis=-1
        )
        focus_p = d_cam * focus_z
        d_cam = (focus_p - lens) / focus_z
        o_cam = lens
    else:
        o_cam = jnp.zeros_like(d_cam)
    rot = camera[:, :3]
    d = jnp.matmul(d_cam, rot.T, precision=_PREC)
    o = jnp.matmul(o_cam, rot.T, precision=_PREC) + camera[:, 3]
    return Ray(o, d)


def uv_to_ray_batched(
    uv: jnp.ndarray,
    cameras: jnp.ndarray,
    resolution,
    focal_length,
    principal_point=(0.5, 0.5),
    lens=None,
) -> Ray:
    """Per-ray camera matrices: uv (R, 2), cameras (R, 3, 4) -> Ray of (R, 3).

    The training sampler draws each ray from a different image
    (testbed_nerf.cu:838-991 behavior), so the camera is per-ray —
    focal_length/principal_point may likewise be per-ray (R, 2) arrays
    (per-image TrainingImageMetadata, nerf_loader.h:45-60), and `lens`
    applies the dataset's distortion model in ray generation.
    """
    res = jnp.asarray(resolution, jnp.float32)
    fl = jnp.atleast_2d(jnp.asarray(focal_length, jnp.float32))
    pp = jnp.atleast_2d(jnp.asarray(principal_point, jnp.float32))
    if lens is not None and lens.is_distorted:
        from .lens import lens_ray_dir

        d_cam = lens_ray_dir(uv, res, fl, pp, lens)
    else:
        d_cam = jnp.stack(
            [
                (uv[..., 0] - pp[..., 0]) * res[0] / fl[..., 0],
                (uv[..., 1] - pp[..., 1]) * res[1] / fl[..., 1],
                jnp.ones_like(uv[..., 0]),
            ],
            axis=-1,
        )
    d = jnp.einsum("rij,rj->ri", cameras[:, :, :3], d_cam, precision=_PREC)
    o = cameras[:, :, 3]
    return Ray(o, d)


def pos_to_uv(
    pos: jnp.ndarray,
    camera: jnp.ndarray,
    resolution,
    focal_length,
    principal_point=(0.5, 0.5),
) -> jnp.ndarray:
    """Project world positions back to screen uv (inverse of uv_to_ray)."""
    res = jnp.asarray(resolution, jnp.float32)
    fl = jnp.asarray(focal_length, jnp.float32)
    pp = jnp.asarray(principal_point, jnp.float32)
    rot = camera[:, :3]
    # rot is orthonormal: inverse = transpose
    p_cam = jnp.matmul(pos - camera[:, 3], rot, precision=_PREC)
    z = p_cam[..., 2]
    u = p_cam[..., 0] / z * fl[0] / res[0] + pp[0]
    v = p_cam[..., 1] / z * fl[1] / res[1] + pp[1]
    return jnp.stack([u, v], axis=-1)


def rolling_shutter_xform(start: jnp.ndarray, end: jnp.ndarray,
                          uv: jnp.ndarray, rolling_shutter,
                          motion_t) -> jnp.ndarray:
    """Per-ray pose between a frame's start/end transforms
    (common_device.cuh:363-371 get_xform_given_rolling_shutter):
    pixel_t = rs.x + rs.y*u + rs.z*v + rs.w*motion_t; the position lerps
    and the rotation slerps to pixel_t. start/end: (..., 3, 4);
    uv (..., 2); motion_t scalar or (...,)."""
    from . import se3

    rs = jnp.asarray(rolling_shutter, jnp.float32)
    pixel_t = rs[0] + rs[1] * uv[..., 0] + rs[2] * uv[..., 1] \
        + rs[3] * motion_t
    pos = start[..., 3] + (end[..., 3] - start[..., 3]) * pixel_t[..., None]
    q0 = se3.matrix_to_quat(start[..., :3])
    q1 = se3.matrix_to_quat(end[..., :3])
    rot = se3.quat_to_matrix(se3.quat_slerp(q0, q1, pixel_t))
    return jnp.concatenate([rot, pos[..., None]], axis=-1)


def pixel_grid_uv(width: int, height: int, snap_to_center: bool = True) -> jnp.ndarray:
    """uv coordinates for every pixel, (H, W, 2), pixel centers by default."""
    off = 0.5 if snap_to_center else 0.0
    u = (jnp.arange(width, dtype=jnp.float32) + off) / width
    v = (jnp.arange(height, dtype=jnp.float32) + off) / height
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu, vv], axis=-1)


def look_at(eye, at, up=(0.0, 1.0, 0.0)):
    """Build a (3,4) NGP-style c2w matrix from eye/at/up (numpy, host-side)."""
    eye = np.asarray(eye, np.float32)
    at = np.asarray(at, np.float32)
    up = np.asarray(up, np.float32)
    z = at - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye], axis=1)
