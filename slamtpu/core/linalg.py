"""Batched small-matrix linear algebra for TPU.

Replaces the Eigen usage in the reference (SelfAdjointEigenSolver per NDT voxel,
/root/reference/extern/svn_ndt/include/voxel_grid_covariance_impl.hpp:298; LDLT
6x6 solves, /root/reference/extern/svn_ndt/include/svn_ndt_impl.hpp:833) with
branch-free, fully batched implementations that vectorize on the VPU.

- ``sym_eig3x3``: cyclic Jacobi eigendecomposition of symmetric 3x3 matrices.
  A fixed number of unrolled sweeps (default 6 -> 18 rotations) reaches ~1e-12
  off-diagonal residual, is robust to repeated eigenvalues, and needs no
  data-dependent control flow.
- ``inv3x3`` / ``det3x3``: closed-form adjugate inverse.
- ``psd_solve``: Cholesky solve for small PSD systems (e.g. 6x6 Newton steps).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _jacobi_rotation(A: jax.Array, V: jax.Array, p: int, q: int):
    """One Jacobi rotation zeroing A[p, q], batched over leading dims."""
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]
    # Branch-free rotation computation; when apq == 0 use identity rotation.
    zero = jnp.abs(apq) < jnp.finfo(A.dtype).tiny * 4
    safe_apq = jnp.where(zero, jnp.ones_like(apq), apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0, jnp.ones_like(t), t)  # sign(0)=0 guard
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(zero, jnp.ones_like(c), c)[..., None]
    s = jnp.where(zero, jnp.zeros_like(s), s)[..., None]

    # Build the rotation as column updates (J has c at (p,p),(q,q); s at (p,q); -s at (q,p))
    Ap = A[..., :, p]
    Aq = A[..., :, q]
    A = A.at[..., :, p].set(c * Ap - s * Aq)
    A = A.at[..., :, q].set(s * Ap + c * Aq)
    Ap = A[..., p, :]
    Aq = A[..., q, :]
    A = A.at[..., p, :].set(c * Ap - s * Aq)
    A = A.at[..., q, :].set(s * Ap + c * Aq)
    Vp = V[..., :, p]
    Vq = V[..., :, q]
    V = V.at[..., :, p].set(c * Vp - s * Vq)
    V = V.at[..., :, q].set(s * Vp + c * Vq)
    return A, V


def sym_eig3x3(A: jax.Array, sweeps: int = 6):
    """Eigendecomposition of symmetric 3x3 matrices.

    Args:
      A: (..., 3, 3) symmetric.
      sweeps: number of cyclic Jacobi sweeps (3 rotations each), unrolled.

    Returns:
      (evals, evecs): evals (..., 3) ascending; evecs (..., 3, 3) with
      eigenvectors as columns, matching ``numpy.linalg.eigh`` layout.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    # Scale to improve conditioning of the rotations for tiny/huge matrices.
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-1, -2), keepdims=True), jnp.finfo(A.dtype).tiny)
    A = A / scale
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = _jacobi_rotation(A, V, p, q)
    evals = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1) * scale[..., 0]
    order = jnp.argsort(evals, axis=-1)
    evals = jnp.take_along_axis(evals, order, axis=-1)
    evecs = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return evals, evecs


def det3x3(A: jax.Array) -> jax.Array:
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def inv3x3(A: jax.Array) -> jax.Array:
    """Closed-form adjugate inverse of (..., 3, 3) matrices."""
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c02 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c10 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c20 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c21 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = A[..., 0, 0] * c00 + A[..., 0, 1] * c01 + A[..., 0, 2] * c02
    safe_det = jnp.where(det == 0, jnp.ones_like(det), det)
    adjT = jnp.stack(
        [
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ],
        axis=-2,
    )
    return adjT / safe_det[..., None, None]


def psd_solve(A: jax.Array, b: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Solve A x = b for batched symmetric positive definite A.

    A: (..., n, n), b: (..., n) or (..., n, k). Optional Tikhonov jitter added
    to the diagonal (the reference adds 1e-6 I before its LDLT solves,
    /root/reference/extern/svn_ndt/include/svn_ndt_impl.hpp:650-653,819-821).
    """
    n = A.shape[-1]
    if jitter:
        A = A + jitter * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
    return x[..., 0] if vec else x


def eig_floor_psd(A: jax.Array, min_eigenvalue: float) -> jax.Array:
    """Floor eigenvalues of a symmetric matrix at ``min_eigenvalue`` and
    recompose (reference final-covariance regularization,
    /root/reference/extern/svn_ndt/include/svn_ndt_impl.hpp:903-949).
    Works for any size via jnp.linalg.eigh (small matrices only)."""
    evals, evecs = jnp.linalg.eigh(A)
    evals = jnp.maximum(evals, min_eigenvalue)
    return jnp.einsum("...ij,...j,...kj->...ik", evecs, evals, evecs)
