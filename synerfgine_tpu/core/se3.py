"""Rotation helpers: axis-angle <-> matrix, composition, quaternion slerp.

Used by the camera-extrinsics optimizer (reference adam_optimizer.h
`RotationAdamOptimizer` operates on the axis-angle manifold) and the
camera path (camera_path.h quaternion keyframes).
"""
import jax.numpy as jnp


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues, gradient-safe at aa = 0 (the identity-pose starting
    point of camera optimization): uses the UNNORMALIZED cross-product
    matrix with sin(t)/t and (1-cos t)/t^2 coefficients, switching to
    their Taylor series near zero so neither values nor grads blow up."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    # fp32-safe floor: the exact branch (and its autodiff) must never see
    # theta^4 underflow; the series branch covers theta2 < 1e-8 exactly
    # enough (error ~ theta2^2)
    safe2 = jnp.maximum(theta2, 1e-8)
    theta = jnp.sqrt(safe2)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + A[..., None] * K + B[..., None] * (K @ K)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s = 2.0 * jnp.sin(theta)
    small = jnp.abs(s) < 1e-8
    axis = v / jnp.where(small[..., None], 1.0, s[..., None])
    return jnp.where(small[..., None], 0.5 * v, axis * theta[..., None])


def compose_axis_angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle of rot(a) @ rot(b)."""
    return matrix_to_axis_angle(axis_angle_to_matrix(a) @ axis_angle_to_matrix(b))


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """q = (w, x, y, z), (..., 4) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(3, 3) -> (w, x, y, z). Numerically-stable branchless form."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.sqrt(jnp.maximum(0.0, 1 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return quat_normalize(jnp.stack([qw, qx, qy, qz], axis=-1))


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1 - t) * theta) / jnp.where(small, 1.0, sin_t))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_t))
    return quat_normalize(w0[..., None] * q0 + w1[..., None] * q1)
