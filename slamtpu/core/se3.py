"""SE(3) pose algebra, batched and jit-friendly.

Matches GTSAM ``Pose3`` semantics used throughout the reference
(/root/reference/extern/svn_ndt/include/svn_ndt_impl.hpp:213-244, 707-716,
854-949): tangent vectors are ordered ``[omega(3), v(3)]`` (rotation first),
``retract`` is the full SE(3) exponential at the pose (right perturbation),
``between(a, b) = a^-1 * b``, and ``Logmap``/``Expmap`` are the true matrix
log/exp on SE(3).

A pose is a ``Pose3`` NamedTuple pytree ``(rot (...,3,3), trans (...,3))``.
All ops broadcast over leading batch dimensions.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import so3


class Pose3(NamedTuple):
    rot: jax.Array  # (..., 3, 3)
    trans: jax.Array  # (..., 3)

    @property
    def batch_shape(self):
        return self.trans.shape[:-1]

    def matrix(self) -> jax.Array:
        """Homogeneous 4x4 matrix."""
        bottom = jnp.zeros(self.trans.shape[:-1] + (1, 4), dtype=self.trans.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
        top = jnp.concatenate([self.rot, self.trans[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)


def identity(batch_shape=(), dtype=jnp.float32) -> Pose3:
    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    trans = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return Pose3(rot, trans)


def from_matrix(T: jax.Array) -> Pose3:
    return Pose3(T[..., :3, :3], T[..., :3, 3])


def from_rpy_xyz(rpy: jax.Array, xyz: jax.Array) -> Pose3:
    return Pose3(so3.rpy_to_rot(rpy), xyz)


def expmap(xi: jax.Array) -> Pose3:
    """SE(3) exponential. xi = [omega, v] (..., 6) -> Pose3."""
    w = xi[..., :3]
    v = xi[..., 3:]
    R = so3.exp(w)
    V = so3.left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return Pose3(R, t)


def logmap(pose: Pose3) -> jax.Array:
    """SE(3) logarithm -> [omega, v] (..., 6)."""
    w = so3.log(pose.rot)
    Vinv = so3.left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, pose.trans)
    return jnp.concatenate([w, v], axis=-1)


def compose(a: Pose3, b: Pose3) -> Pose3:
    rot = a.rot @ b.rot
    trans = jnp.einsum("...ij,...j->...i", a.rot, b.trans) + a.trans
    return Pose3(rot, trans)


def inverse(p: Pose3) -> Pose3:
    rt = jnp.swapaxes(p.rot, -1, -2)
    return Pose3(rt, -jnp.einsum("...ij,...j->...i", rt, p.trans))


def between(a: Pose3, b: Pose3) -> Pose3:
    """a^-1 * b (GTSAM Pose3::between)."""
    return compose(inverse(a), b)


def retract(p: Pose3, xi: jax.Array) -> Pose3:
    """Right retraction p * Exp(xi), GTSAM Pose3::retract with full Expmap."""
    return compose(p, expmap(xi))


def local(a: Pose3, b: Pose3) -> jax.Array:
    """Local coordinates of b at a: Log(a^-1 b)."""
    return logmap(between(a, b))


def transform_points(p: Pose3, pts: jax.Array) -> jax.Array:
    """Apply pose to points. pts: (..., N, 3); pose batch dims broadcast."""
    return jnp.einsum("...ij,...nj->...ni", p.rot, pts) + p.trans[..., None, :]


def adjoint(p: Pose3) -> jax.Array:
    """Adjoint matrix of SE(3) in [omega, v] ordering: (..., 6, 6)."""
    R = p.rot
    tx = so3.hat(p.trans)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate([tx @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cast(p: Pose3, dtype) -> Pose3:
    """Cast a pose to a dtype (e.g. f64 smoother state -> f32 NDT path)."""
    return Pose3(p.rot.astype(dtype), p.trans.astype(dtype))


def interpolate(a: Pose3, b: Pose3, t: jax.Array) -> Pose3:
    """Geodesic interpolation a * Exp(t * Log(a^-1 b))."""
    return retract(a, t[..., None] * local(a, b))
