"""Component-plane NDT objective: TPU-layout-optimal pair math.

The straightforward objective materializes (N, 7, 3, 3)-shaped intermediates.
On TPU the trailing dimension maps to the 128-lane axis and the second-minor
to the 8-sublane axis, so trailing dims of 3 use 3/128 lanes and 3/8 sublanes
— ~100x physical traffic and VPU waste. Measured: the pair math costs ~3 ms
per 128k-point evaluation, ~30x off the bandwidth roofline, and dominates
both Newton and SVN once gathers were fixed.

This module computes the identical objective with every per-point quantity
stored as a PLANE — an (N,)-minor row of a 2-D array — so each array is fully
lane-packed:

  tp (3, N), per-neighbor mu/icov slices of the transposed mega-row (96, N),
  accumulators b (3, N) and M (9, N), and the final 6x6 reduction expressed
  through hat(x)-cross-product planes (H_vv = R^T (sum M) R commutes with the
  point sum; H_wv and H_ww reduce per-entry planes).

Exact parity with regmap.score_grad_hess_reg is enforced in tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.se3 import Pose3
from .objective import MAX_EXPONENT_ARG, MIN_FACTOR, NdtObjective
from .regmap import RegMap


def _cross_planes(x, v):
    """Cross product of plane triples: x, v: (3, N) -> x cross v (3, N)."""
    return jnp.stack(
        [
            x[1] * v[2] - x[2] * v[1],
            x[2] * v[0] - x[0] * v[2],
            x[0] * v[1] - x[1] * v[0],
        ]
    )


def score_grad_hess_planes(
    points: jax.Array,  # (N, 3)
    mask: jax.Array,  # (N,)
    pose: Pose3,
    regmap: RegMap,
    d1: float,
    d2: float,
    grid_shape: tuple,
    hess_lambda: float = 1e-6,
    gathered: jax.Array | None = None,  # optional pre-gathered megaT (96, N)
) -> NdtObjective:
    gx, gy, gz = grid_shape
    n_cells = gx * gy * gz
    N = points.shape[0]
    dtype = points.dtype
    R = pose.rot

    x_pl = points.T  # (3, N) original body-frame points
    tp = R @ x_pl + pose.trans[:, None]  # (3, N)

    if gathered is None:
        inv_res = (1.0 / regmap.resolution).astype(dtype)
        org = regmap.origin.astype(dtype)
        cx = jnp.floor((tp[0] - org[0]) * inv_res).astype(jnp.int32) - regmap.bbox_min[0]
        cy = jnp.floor((tp[1] - org[1]) * inv_res).astype(jnp.int32) - regmap.bbox_min[1]
        cz = jnp.floor((tp[2] - org[2]) * inv_res).astype(jnp.int32) - regmap.bbox_min[2]
        inb = (
            mask
            & (cx >= 0) & (cx < gx)
            & (cy >= 0) & (cy < gy)
            & (cz >= 0) & (cz < gz)
        )
        flat = jnp.where(inb, (cx * gy + cy) * gz + cz, n_cells)
        drow = regmap.grid[flat]
        megaT = regmap.packed[drow].T  # (96, N): rows = neighbor fields
    else:
        megaT = gathered

    score = jnp.zeros((), dtype)
    n_contrib = jnp.zeros((), jnp.int32)
    b = jnp.zeros((3, N), dtype)  # sum_k f * icov_k * xrel_k   (world frame)
    M = jnp.zeros((9, N), dtype)  # sum_k f * icov_k            (world frame)

    for k in range(7):
        base = 12 * k
        mu = megaT[base : base + 3]  # (3, N)
        ic = megaT[base + 3 : base + 12]  # (9, N) row-major 3x3
        active = megaT[84 + k] > 0.5
        xr = tp - mu
        icx0 = ic[0] * xr[0] + ic[1] * xr[1] + ic[2] * xr[2]
        icx1 = ic[3] * xr[0] + ic[4] * xr[1] + ic[5] * xr[2]
        icx2 = ic[6] * xr[0] + ic[7] * xr[1] + ic[8] * xr[2]
        mahal = jnp.maximum(xr[0] * icx0 + xr[1] * icx1 + xr[2] * icx2, 0.0)
        exponent = 0.5 * d2 * mahal
        ok = active & (exponent <= MAX_EXPONENT_ARG) & jnp.isfinite(mahal)
        e = jnp.exp(-jnp.where(ok, exponent, 0.0))
        score = score + jnp.sum(jnp.where(ok, -d1 * e, 0.0))
        n_contrib = n_contrib + jnp.sum(ok, dtype=jnp.int32)
        f = d1 * d2 * e
        f = jnp.where(ok & (jnp.abs(f) >= MIN_FACTOR), f, 0.0)
        b = b + jnp.stack([f * icx0, f * icx1, f * icx2])
        M = M + f[None, :] * ic

    # gradient: g_v = R^T sum b ; g_w = sum x cross (R^T b)
    q = R.T @ b  # (3, N)
    g_v = jnp.sum(q, axis=1)
    g_w = jnp.sum(_cross_planes(x_pl, q), axis=1)
    grad = jnp.concatenate([g_w, g_v])

    # Hessian blocks with P = R^T M R (per point, planes):
    #   H_vv = sum P ;  H_wv = sum hat(x) P ;  H_ww = sum hat(x) P hat(x)^T
    Mm = M.reshape(3, 3, N)
    # P = R^T Mm R: contract with the 3x3 constants
    P = jnp.einsum("ia,ijn,jb->abn", R, Mm, R)  # (3, 3, N)
    H_vv = jnp.sum(P, axis=2)
    # With X = hat(x): H_wv = X P (since J_w = -R X and X^T = -X) and
    # H_ww = -(X P) X. Column b of X P is x cross P[:, b]; row a of
    # -(Q X) is +x cross Q[a, :].
    Q = jnp.stack([_cross_planes(x_pl, P[:, bcol]) for bcol in range(3)], axis=1)
    H_wv = jnp.sum(Q, axis=2)
    W = jnp.stack([_cross_planes(x_pl, Q[arow]) for arow in range(3)], axis=0)
    H_ww = jnp.sum(W, axis=2)

    top = jnp.concatenate([H_ww, H_wv], axis=1)
    bot = jnp.concatenate([H_wv.T, H_vv], axis=1)
    hess = jnp.concatenate([top, bot], axis=0)
    hess = 0.5 * (hess + hess.T) + hess_lambda * jnp.eye(6, dtype=dtype)
    return NdtObjective(score, grad, hess, n_contrib)
