"""SO(3) rotation algebra, batched and jit-friendly.

Conventions follow GTSAM (the reference fuses with GTSAM poses, e.g.
/root/reference/extern/svn_ndt/include/svn_ndt_impl.hpp:707-716):

- ``exp`` / ``log`` are the matrix exponential/logarithm (Rodrigues).
- ``rpy_to_rot(r, p, y)`` builds ``Rz(y) @ Ry(p) @ Rx(r)`` (GTSAM ``Rot3::RzRyRx``);
  ``rot_to_rpy`` inverts it.
- Quaternions are ``[w, x, y, z]`` scalar-first (matching the ANPP/compass wire
  convention used in /root/reference/src/compcallback.cpp:278-287).

All functions broadcast over arbitrary leading batch dimensions and preserve the
input dtype. Near-zero angles use Taylor expansions so everything is safely
differentiable under ``jax.grad``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix: hat(w) @ v == cross(w, v). w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jax.Array):
    """Return (sin(t)/t, (1-cos(t))/t^2) with Taylor fallbacks for small t."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    safe_t = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_t)) / safe_sq)
    return a, b


def exp(w: jax.Array) -> jax.Array:
    """SO(3) exponential map (Rodrigues). w: (..., 3) -> (..., 3, 3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log(R: jax.Array) -> jax.Array:
    """SO(3) logarithm map. R: (..., 3, 3) -> (..., 3).

    Uses the quaternion route, which is stable across the whole rotation range
    including angles near pi (where the trace formula degenerates).
    """
    q = rot_to_quat(R)
    return quat_log(q)


def left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian of SO(3): J_l = I + (1-cos t)/t^2 W + (t - sin t)/t^3 W^2."""
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    safe_t = jnp.sqrt(safe_sq)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_t)) / safe_sq)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (safe_t - jnp.sin(safe_t)) / (safe_sq * safe_t),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    safe_t = jnp.sqrt(safe_sq)
    # coefficient of W^2: (1/t^2) - (1 + cos t) / (2 t sin t)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        1.0 / safe_sq - (1.0 + jnp.cos(safe_t)) / (2.0 * safe_t * jnp.sin(safe_t)),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


# ---------------------------------------------------------------------------
# Euler angles (GTSAM RzRyRx convention)
# ---------------------------------------------------------------------------

def rpy_to_rot(rpy: jax.Array) -> jax.Array:
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll). rpy: (..., 3) -> (..., 3, 3)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rot_to_rpy(R: jax.Array) -> jax.Array:
    """Inverse of rpy_to_rot. Returns (..., 3) = [roll, pitch, yaw]."""
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (scalar-first [w, x, y, z])
# ---------------------------------------------------------------------------

def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix. Matches the reference's Cb2n
    quaternion->DCM (/root/reference/src/registercallback.cpp:188-223)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = qw * qw + qx * qx + qy * qy + qz * qz
    s = 2.0 / jnp.where(n > 0, n, jnp.ones_like(n))
    wx, wy, wz = s * qw * qx, s * qw * qy, s * qw * qz
    xx, xy, xz = s * qx * qx, s * qx * qy, s * qx * qz
    yy, yz, zz = s * qy * qy, s * qy * qz, s * qz * qz
    one = jnp.ones_like(qw)
    row0 = jnp.stack([one - (yy + zz), xy - wz, xz + wy], axis=-1)
    row1 = jnp.stack([xy + wz, one - (xx + zz), yz - wx], axis=-1)
    row2 = jnp.stack([xz - wy, yz + wx, one - (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion [w,x,y,z], w >= 0.

    Branch-free Shepperd's method: compute all four candidate quadruples and
    select by the largest diagonal-based magnitude (stable for all rotations).
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22
    # Four candidates, each valid when its pivot term is the largest.
    qw0 = 1.0 + tr
    c0 = jnp.stack([qw0, r21 - r12, r02 - r20, r10 - r01], axis=-1)
    qx1 = 1.0 + r00 - r11 - r22
    c1 = jnp.stack([r21 - r12, qx1, r01 + r10, r02 + r20], axis=-1)
    qy2 = 1.0 - r00 + r11 - r22
    c2 = jnp.stack([r02 - r20, r01 + r10, qy2, r12 + r21], axis=-1)
    qz3 = 1.0 - r00 - r11 + r22
    c3 = jnp.stack([r10 - r01, r02 + r20, r12 + r21, qz3], axis=-1)
    pivots = jnp.stack([qw0, qx1, qy2, qz3], axis=-1)
    choice = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4cand, 4comp)
    q = jnp.take_along_axis(cands, choice[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_log(q: jax.Array) -> jax.Array:
    """Rotation-vector log of a unit quaternion."""
    qw = q[..., 0]
    qv = q[..., 1:]
    # ensure shortest arc
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qw = qw * sign
    qv = qv * sign[..., None]
    vn = jnp.linalg.norm(qv, axis=-1)
    angle = 2.0 * jnp.arctan2(vn, qw)
    small = vn < _EPS
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 0.5), angle / jnp.where(small, 1.0, vn))
    return qv * scale[..., None]


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions [w,x,y,z]."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation, shortest arc (as Eigen slerp, used by the
    reference CompFrame interpolation /root/reference/include/dataframe.hpp:251)."""
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot[..., None] < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
