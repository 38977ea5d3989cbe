"""Dense Gauss-Newton / Levenberg-Marquardt smoother for the sliding window.

Replaces the reference's iSAM2 updates (/root/reference/run/pipeline.cpp:
738-759, run/pipeline_ligo_tc.cpp:578-587) with a full re-linearized solve
per keyframe: residual Jacobians come from ``jax.jacfwd`` through the factor
residuals (the window is tiny, so a dense (W*15)^2 normal-equation solve on
the MXU beats incremental sparse updates), with Levenberg damping and
fixed-iteration ``lax`` loops. Marginal covariances — needed by the apps for
KeyFrameStats (pipeline.cpp:753) — are blocks of the inverse normal matrix.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .graph import Factors, WindowState, residuals

STATE_DIM = 15  # pose(6) + vel(3) + bias(6)


class SmootherConfig(NamedTuple):
    iterations: int = 8
    damping: float = 1e-6
    step_tol: float = 1e-10


class SmootherResult(NamedTuple):
    state: WindowState
    hessian: jax.Array  # (W*15, W*15) Gauss-Newton normal matrix at solution
    error: jax.Array  # () final 0.5*||r||^2
    iterations: jax.Array


def _linearize(state: WindowState, factors: Factors):
    """Residual vector and dense Jacobian w.r.t. the stacked window tangent."""
    W = state.window

    def r_of_delta(delta):
        return residuals(state.retract(delta.reshape(W, STATE_DIM)), factors)

    zero = jnp.zeros(W * STATE_DIM, dtype=state.trans.dtype)
    r = r_of_delta(zero)
    J = jax.jacfwd(r_of_delta)(zero)
    return r, J


def optimize(
    state: WindowState, factors: Factors, cfg: SmootherConfig = SmootherConfig()
) -> SmootherResult:
    W = state.window
    n = W * STATE_DIM
    dtype = state.trans.dtype
    # Inactive states must stay pinned: add a unit prior on their tangent.
    inactive = ~state.active
    pin = jnp.repeat(inactive.astype(dtype), STATE_DIM)

    # QR on the augmented Jacobian instead of normal equations: J^T J squares
    # the condition number, which overflows float32 on TPU (the tests run
    # f64 on CPU, but the deployed smoother runs f32 on device).
    sqrt_damp = jnp.sqrt(jnp.asarray(cfg.damping, dtype))

    def gn_step(st):
        r, J = _linearize(st, factors)
        aug = jnp.concatenate(
            [J, jnp.diag(pin), sqrt_damp * jnp.eye(n, dtype=dtype)], axis=0
        )
        r_aug = jnp.concatenate([r, jnp.zeros(2 * n, dtype=dtype)])
        Q, R = jnp.linalg.qr(aug)
        delta = -jax.scipy.linalg.solve_triangular(R, Q.T @ r_aug, lower=False)
        return delta

    def body(carry, _):
        st, err, it = carry
        delta = gn_step(st)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        step_ok = jnp.linalg.norm(delta) > cfg.step_tol
        new_st = st.retract(jnp.where(step_ok, delta, 0.0).reshape(W, STATE_DIM))
        new_err = 0.5 * jnp.sum(residuals(new_st, factors) ** 2)
        # Reject steps that increase the cost (simple LM-style guard).
        accept = new_err <= err
        st_out = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b) if a.dtype != bool else b,
            new_st,
            st,
        )
        return (st_out, jnp.where(accept, new_err, err), it + 1), None

    err0 = 0.5 * jnp.sum(residuals(state, factors) ** 2)
    (final_state, err, iters), _ = jax.lax.scan(
        body, (state, err0, jnp.asarray(0, jnp.int32)), None, length=cfg.iterations
    )
    r, J = _linearize(final_state, factors)
    # Pin every UNOBSERVED dof explicitly (zero Jacobian column), not just
    # inactive states: a pose-only window (odom_ndt) leaves active states'
    # vel/bias blocks exactly singular, and marginal_covariance's tiny
    # jitter inversion only worked because the zero cross-blocks kept the
    # pose block clean — one future factor touching vel would break it
    # silently. A unit pin gives unobserved dofs a finite O(1) marginal
    # variance and leaves observed blocks untouched.
    unobserved = ~jnp.any(jnp.abs(J) > 0.0, axis=0)
    H = J.T @ J + jnp.diag(jnp.maximum(pin, unobserved.astype(dtype)))
    return SmootherResult(final_state, H, 0.5 * jnp.sum(r**2), iters)


def marginal_covariance(hessian: jax.Array, idx, damping: float = 1e-12):
    """Marginal covariance of state ``idx``: the corresponding 15x15 block of
    H^-1 (what iSAM2's marginalCovariance returns for the pose sub-block,
    run/pipeline.cpp:753). Returns the (15, 15) block; pose part is [:6, :6]."""
    n = hessian.shape[0]
    Hinv = jnp.linalg.inv(hessian + damping * jnp.eye(n, dtype=hessian.dtype))
    s = idx * STATE_DIM
    return jax.lax.dynamic_slice(Hinv, (s, s), (STATE_DIM, STATE_DIM))
