"""Fused Pallas kernel for the NDT pair math.

Division of labor with XLA (measured on v5e):
- XLA keeps what it is good at: the dense-grid + mega-row gathers
  (slamtpu.ndt.regmap). Mosaic cannot express large-table gathers
  (tpu.dynamic_gather addresses one vreg), so they stay outside.
- The per-pair math (Mahalanobis -> exp weight -> gradient/Hessian moments)
  reads only CONTIGUOUS per-point data — (N, 96) mega rows + (N, 3) points —
  and XLA leaves ~40x of bandwidth on the table for it (3.1 ms per 128k-pt
  evaluation). This kernel fuses the whole chain into one pass over point
  blocks with on-chip accumulation of the 44 reduction outputs
  (score, grad(6), hess(36), count).

Padding/out-of-map points arrive with the sentinel mega row (all zeros,
validity lanes 0), so no separate mask plane is needed.

Outputs exactly match regmap.score_grad_hess_reg (tests/test_regmap.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import se3
from ..core.se3 import Pose3
from .objective import MAX_EXPONENT_ARG, MIN_FACTOR, NdtObjective
from .regmap import RegMap

BLOCK = 2048
_OUT_LANES = 128  # single (8, 128) accumulator tile


def _kernel(params_ref, ptsT_ref, megaT_ref, out_ref, *, gicp: bool):
    """Grid over point blocks; accumulates partials into one output tile.

    params (SMEM, (1, 16)): R row-major(9), t(3), d1, d2, gicp_mode,
    gicp_max_mahal (mode > 0.5 switches the pair weight from the NDT
    exponential to the trimmed GICP quadratic cost)
    ptsT (VMEM, (3, B)): body-frame points, plane layout
    megaT (VMEM, (96, B)): transposed mega rows
    out (SMEM, (1, 64)): [0]=score, [1:7]=grad, [7:43]=hess row-major,
    [43]=count (scalar writes; VMEM tiles cannot take scattered scalar sets)
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for c in range(44):
            out_ref[0, c] = 0.0

    R00, R01, R02 = params_ref[0, 0], params_ref[0, 1], params_ref[0, 2]
    R10, R11, R12 = params_ref[0, 3], params_ref[0, 4], params_ref[0, 5]
    R20, R21, R22 = params_ref[0, 6], params_ref[0, 7], params_ref[0, 8]
    t0, t1, t2 = params_ref[0, 9], params_ref[0, 10], params_ref[0, 11]
    d1 = params_ref[0, 12]
    d2 = params_ref[0, 13]
    # gicp is a TRACE-TIME constant: the NDT variant compiles with zero
    # mode-switch overhead (runtime selects with a scalar predicate over
    # vectors don't legalize in Mosaic anyway)
    gicp_max_mahal = params_ref[0, 15]

    x0 = ptsT_ref[0, :]
    x1 = ptsT_ref[1, :]
    x2 = ptsT_ref[2, :]
    tp0 = R00 * x0 + R01 * x1 + R02 * x2 + t0
    tp1 = R10 * x0 + R11 * x1 + R12 * x2 + t1
    tp2 = R20 * x0 + R21 * x1 + R22 * x2 + t2

    score = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    b0 = jnp.zeros_like(x0)
    b1 = jnp.zeros_like(x0)
    b2 = jnp.zeros_like(x0)
    M = [jnp.zeros_like(x0) for _ in range(9)]

    for k in range(7):
        base = 12 * k
        mu0 = megaT_ref[base + 0, :]
        mu1 = megaT_ref[base + 1, :]
        mu2 = megaT_ref[base + 2, :]
        ic = [megaT_ref[base + 3 + c, :] for c in range(9)]
        valid = megaT_ref[84 + k, :] > 0.5
        xr0 = tp0 - mu0
        xr1 = tp1 - mu1
        xr2 = tp2 - mu2
        icx0 = ic[0] * xr0 + ic[1] * xr1 + ic[2] * xr2
        icx1 = ic[3] * xr0 + ic[4] * xr1 + ic[5] * xr2
        icx2 = ic[6] * xr0 + ic[7] * xr1 + ic[8] * xr2
        mahal = jnp.maximum(xr0 * icx0 + xr1 * icx1 + xr2 * icx2, 0.0)
        exponent = 0.5 * d2 * mahal
        zero = jnp.float32(0.0)
        if gicp:
            # d2 slot carries max_corr_dist^2 in GICP mode (unused by the
            # quadratic cost): the reference's correspondence-distance gate
            # (gicp_corr_dist_threshold) on top of the Mahalanobis trim
            dist2 = xr0 * xr0 + xr1 * xr1 + xr2 * xr2
            ok = valid & (mahal <= gicp_max_mahal) & (dist2 <= d2)
            pair_score = -mahal
            f = jnp.where(ok, jnp.float32(-2.0), zero)
        else:
            ok = valid & (exponent <= jnp.float32(MAX_EXPONENT_ARG))
            e = jnp.exp(-jnp.where(ok, exponent, zero))
            pair_score = -d1 * e
            f = d1 * d2 * e
            f = jnp.where(ok & (jnp.abs(f) >= MIN_FACTOR), f, zero)
        score = score + jnp.sum(jnp.where(ok, pair_score, zero))
        count = count + jnp.sum(jnp.where(ok, jnp.float32(1.0), zero))
        b0 = b0 + f * icx0
        b1 = b1 + f * icx1
        b2 = b2 + f * icx2
        M = [M[c] + f * ic[c] for c in range(9)]

    _finish_block(
        (R00, R01, R02, R10, R11, R12, R20, R21, R22),
        (x0, x1, x2), (b0, b1, b2), M, score, count, out_ref,
    )


def _finish_block(Rf, x, b, M, score, count, out_ref):
    """Shared accumulator tail: assemble gradient/Hessian from the pair-loop
    moments (b = sum f*icx planes, M = sum f*icov planes) and accumulate the
    44 reduction outputs. Identical for the NDT, GICP and aniso pair loops."""
    R00, R01, R02, R10, R11, R12, R20, R21, R22 = Rf
    x0, x1, x2 = x
    b0, b1, b2 = b
    # gradient: q = R^T b ; g_v = sum q ; g_w = sum x cross q
    q0 = R00 * b0 + R10 * b1 + R20 * b2
    q1 = R01 * b0 + R11 * b1 + R21 * b2
    q2 = R02 * b0 + R12 * b1 + R22 * b2
    gv = [jnp.sum(q0), jnp.sum(q1), jnp.sum(q2)]
    gw = [
        jnp.sum(x1 * q2 - x2 * q1),
        jnp.sum(x2 * q0 - x0 * q2),
        jnp.sum(x0 * q1 - x1 * q0),
    ]

    # P = R^T M R per point (planes); Rcols[a][i] = R[i, a]
    Rm = ((R00, R01, R02), (R10, R11, R12), (R20, R21, R22))
    P = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for bcol in range(3):
            acc = None
            for ii in range(3):
                for jj in range(3):
                    term = (Rm[ii][a] * Rm[jj][bcol]) * M[3 * ii + jj]
                    acc = term if acc is None else acc + term
            P[a][bcol] = acc

    def cross(u):  # x cross (u0, u1, u2) planes
        return (
            x[1] * u[2] - x[2] * u[1],
            x[2] * u[0] - x[0] * u[2],
            x[0] * u[1] - x[1] * u[0],
        )

    # H_vv = sum P ; Q[:, b] = x cross P[:, b]; H_wv = sum Q ;
    # H_ww[a, :] = sum x cross Q[a, :]
    Qcols = [cross((P[0][bcol], P[1][bcol], P[2][bcol])) for bcol in range(3)]
    H = [[jnp.zeros(()) for _ in range(6)] for _ in range(6)]
    for a in range(3):
        for bcol in range(3):
            H[3 + a][3 + bcol] = jnp.sum(P[a][bcol])
            H[a][3 + bcol] = jnp.sum(Qcols[bcol][a])
            H[3 + bcol][a] = H[a][3 + bcol]
    for a in range(3):
        wrow = cross((Qcols[0][a], Qcols[1][a], Qcols[2][a]))
        for bcol in range(3):
            H[a][bcol] = jnp.sum(wrow[bcol])

    out_ref[0, 0] = out_ref[0, 0] + score
    out_ref[0, 43] = out_ref[0, 43] + count
    for c in range(3):
        out_ref[0, 1 + c] = out_ref[0, 1 + c] + gw[c]
        out_ref[0, 4 + c] = out_ref[0, 4 + c] + gv[c]
    for a in range(6):
        for bcol in range(6):
            idx = 7 + 6 * a + bcol
            out_ref[0, idx] = out_ref[0, idx] + H[a][bcol]


def _kernel_aniso(params_ref, ptsT_ref, megaT_ref, scovT_ref, out_ref):
    """Plane-to-plane GICP pair math: per pair fuse S = C_t + R C_src R^T,
    invert 3x3 in-register (closed-form adjugate), trimmed quadratic cost.

    megaT carries the AUX payload (mean(3), plane-regularized target COV(9)
    per slot); scovT (9, B) is the per-POINT body-frame source covariance.
    params: R(9), t(3), [12] unused, [13] max_corr_dist^2, [14] unused,
    [15] max_mahal.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for c in range(44):
            out_ref[0, c] = 0.0

    R00, R01, R02 = params_ref[0, 0], params_ref[0, 1], params_ref[0, 2]
    R10, R11, R12 = params_ref[0, 3], params_ref[0, 4], params_ref[0, 5]
    R20, R21, R22 = params_ref[0, 6], params_ref[0, 7], params_ref[0, 8]
    t0, t1, t2 = params_ref[0, 9], params_ref[0, 10], params_ref[0, 11]
    corr2 = params_ref[0, 13]
    max_mahal = params_ref[0, 15]

    x0 = ptsT_ref[0, :]
    x1 = ptsT_ref[1, :]
    x2 = ptsT_ref[2, :]
    tp0 = R00 * x0 + R01 * x1 + R02 * x2 + t0
    tp1 = R10 * x0 + R11 * x1 + R12 * x2 + t1
    tp2 = R20 * x0 + R21 * x1 + R22 * x2 + t2

    # rc = R C_src R^T per point (C_src symmetric row-major in scovT)
    Rm = ((R00, R01, R02), (R10, R11, R12), (R20, R21, R22))
    s = [scovT_ref[c, :] for c in range(9)]
    RC = [[None] * 3 for _ in range(3)]  # R @ C_src
    for ii in range(3):
        for jj in range(3):
            RC[ii][jj] = (
                Rm[ii][0] * s[jj] + Rm[ii][1] * s[3 + jj] + Rm[ii][2] * s[6 + jj]
            )
    rc = [[None] * 3 for _ in range(3)]  # (R C) @ R^T
    for ii in range(3):
        for jj in range(3):
            rc[ii][jj] = (
                RC[ii][0] * Rm[jj][0] + RC[ii][1] * Rm[jj][1] + RC[ii][2] * Rm[jj][2]
            )

    score = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    b0 = jnp.zeros_like(x0)
    b1 = jnp.zeros_like(x0)
    b2 = jnp.zeros_like(x0)
    M = [jnp.zeros_like(x0) for _ in range(9)]
    zero = jnp.float32(0.0)

    for k in range(7):
        base = 12 * k
        mu0 = megaT_ref[base + 0, :]
        mu1 = megaT_ref[base + 1, :]
        mu2 = megaT_ref[base + 2, :]
        ct = [megaT_ref[base + 3 + c, :] for c in range(9)]
        valid = megaT_ref[84 + k, :] > 0.5
        # fused symmetric S = C_t + rc (6 unique planes)
        s00 = ct[0] + rc[0][0]
        s01 = ct[1] + rc[0][1]
        s02 = ct[2] + rc[0][2]
        s11 = ct[4] + rc[1][1]
        s12 = ct[5] + rc[1][2]
        s22 = ct[8] + rc[2][2]
        # closed-form symmetric 3x3 inverse (adjugate / det)
        c00 = s11 * s22 - s12 * s12
        c01 = s02 * s12 - s01 * s22
        c02 = s01 * s12 - s02 * s11
        c11 = s00 * s22 - s02 * s02
        c12 = s01 * s02 - s00 * s12
        c22 = s00 * s11 - s01 * s01
        det = s00 * c00 + s01 * c01 + s02 * c02
        inv_det = jnp.float32(1.0) / jnp.where(
            jnp.abs(det) > jnp.float32(1e-30), det, jnp.float32(1.0)
        )
        i00 = c00 * inv_det
        i01 = c01 * inv_det
        i02 = c02 * inv_det
        i11 = c11 * inv_det
        i12 = c12 * inv_det
        i22 = c22 * inv_det
        xr0 = tp0 - mu0
        xr1 = tp1 - mu1
        xr2 = tp2 - mu2
        icx0 = i00 * xr0 + i01 * xr1 + i02 * xr2
        icx1 = i01 * xr0 + i11 * xr1 + i12 * xr2
        icx2 = i02 * xr0 + i12 * xr1 + i22 * xr2
        mahal = jnp.maximum(xr0 * icx0 + xr1 * icx1 + xr2 * icx2, 0.0)
        dist2 = xr0 * xr0 + xr1 * xr1 + xr2 * xr2
        ok = valid & (mahal <= max_mahal) & (dist2 <= corr2)
        f = jnp.where(ok, jnp.float32(-2.0), zero)
        score = score + jnp.sum(jnp.where(ok, -mahal, zero))
        count = count + jnp.sum(jnp.where(ok, jnp.float32(1.0), zero))
        b0 = b0 + f * icx0
        b1 = b1 + f * icx1
        b2 = b2 + f * icx2
        fi = (i00, i01, i02, i01, i11, i12, i02, i12, i22)
        M = [M[c] + f * fi[c] for c in range(9)]

    _finish_block(
        (R00, R01, R02, R10, R11, R12, R20, R21, R22),
        (x0, x1, x2), (b0, b1, b2), M, score, count, out_ref,
    )


def gather_megaT(
    points, mask, pose: Pose3, regmap: RegMap, grid_shape, kd_radius=None,
    table: str = "packed",
):
    """XLA side: voxel assignment + mega-row gather -> (96, N) float32.

    Index resolution is shared with the XLA objective (regmap.point_rows) so
    the fused and gathered paths cannot drift. ``kd_radius`` applies the
    KDTREE-mode centroid-distance gate by zeroing the slot-validity flags of
    out-of-radius candidates (regmap.radius_gate) — the kernel needs no
    change. ``table="aux"`` gathers from ``RegMap.packed_aux`` (the
    alternative payload, e.g. plane-regularized covariances)."""
    from .regmap import point_rows, radius_gate

    tp, drow = point_rows(points, mask, pose, regmap, grid_shape)
    src = regmap.packed if table == "packed" else regmap.packed_aux
    mega = src[drow]  # (N, 96)
    if kd_radius is not None and kd_radius > 0.0:
        mu = mega[:, :84].reshape(-1, 7, 12)[..., 0:3]
        act = radius_gate(tp, mu, mega[:, 84:91] > 0.5, kd_radius)
        mega = jnp.concatenate(
            [mega[:, :84], act.astype(mega.dtype), mega[:, 91:]], axis=1
        )
    return mega.T.astype(jnp.float32)  # (96, N)


def fused_objective(
    ptsT, megaT, pose: Pose3, d1, d2, hess_lambda=1e-6,
    gicp: bool = False, gicp_max_mahal: float = 9.0, block: int = None,
    interpret: bool = None, src_covT=None,
) -> NdtObjective:
    """Pallas side: the fused pair math on pre-gathered mega rows.

    With ``gicp=True`` the pair weight switches to the trimmed quadratic
    GICP cost (use a RegMap built from gicp_map; d1/d2 are ignored).
    With ``src_covT`` ((9, N) per-point body-frame source covariances) the
    kernel runs the PLANE-TO-PLANE mode: megaT must carry the aux payload
    (plane-regularized target COVARIANCES), the per-pair fusion
    (C_t + R C_s R^T)^-1 happens in-register, and d2 carries
    max_corr_dist^2. ``block`` overrides the point-block size (default
    BLOCK; tests on small sharded inputs use smaller blocks). ``interpret``
    must be True when the computation executes on non-TPU devices; None
    falls back to the default backend — callers that place work on an
    explicit (e.g. CPU test) mesh while a TPU is the default backend MUST
    pass it (the default backend is not where a shard_map over another
    platform's mesh runs)."""
    N = ptsT.shape[1]
    block = block or BLOCK
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert N % block == 0, f"N={N} must be a multiple of block={block}"
    params = jnp.concatenate(
        [
            pose.rot.astype(jnp.float32).reshape(9),
            pose.trans.astype(jnp.float32),
            jnp.asarray(
                [d1, d2, 1.0 if gicp else 0.0, gicp_max_mahal], jnp.float32
            ),
        ]
    ).reshape(1, 16)
    if src_covT is not None:
        out = pl.pallas_call(
            _kernel_aniso,
            out_shape=jax.ShapeDtypeStruct((1, 64), jnp.float32),
            grid=(N // block,),
            in_specs=[
                pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((96, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((9, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 64), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            interpret=interpret,
        )(params, ptsT, megaT, src_covT.astype(jnp.float32))[0]
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, gicp=gicp),
            out_shape=jax.ShapeDtypeStruct((1, 64), jnp.float32),
            grid=(N // block,),
            in_specs=[
                pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((3, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((96, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 64), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            interpret=interpret,  # CPU tests / CPU meshes run interpreted
        )(params, ptsT, megaT)[0]

    score = out[0]
    grad = out[1:7]
    hess = out[7:43].reshape(6, 6)
    hess = hess + hess_lambda * jnp.eye(6, dtype=jnp.float32)
    return NdtObjective(score, grad, hess, out[43].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("grid_shape", "hess_lambda", "d1", "d2"))
def score_grad_hess_fused(
    points: jax.Array,  # (N, 3) float32, N multiple of BLOCK
    mask: jax.Array,  # (N,)
    pose: Pose3,
    regmap: RegMap,
    d1: float,
    d2: float,
    grid_shape: tuple,
    hess_lambda: float = 1e-6,
) -> NdtObjective:
    """XLA gathers + Pallas fused pair math. float32 only (device path)."""
    from .objective import sanitize_points

    assert points.shape[0] % BLOCK == 0, f"N must be a multiple of {BLOCK}"
    points, mask = sanitize_points(points, mask)
    megaT = gather_megaT(points, mask, pose, regmap, grid_shape)
    return fused_objective(points.T.astype(jnp.float32), megaT, pose, d1, d2, hess_lambda)


def gicp_align_fused(
    points: jax.Array,
    mask: jax.Array,
    regmap: RegMap,  # built from gicp_map(...)
    init_pose: Pose3,
    cfg,  # NewtonConfig
    grid_shape: tuple,
    inner_iters: int = 1,
    max_mahal: float = 9.0,
    interpret: bool = None,
):
    """VGICP registration on the fused kernel (cf. ndt.gicp)."""
    return newton_align_fused(
        points, mask, regmap, init_pose, cfg, grid_shape, inner_iters,
        _gicp=True, _gicp_max_mahal=max_mahal, interpret=interpret,
    )


def newton_align_fused(
    points: jax.Array,
    mask: jax.Array,
    regmap: RegMap,
    init_pose: Pose3,
    cfg,  # NewtonConfig
    grid_shape: tuple,
    inner_iters: int = 1,
    reg_pose: Pose3 = None,
    interpret: bool = None,
    block: int = None,
    final_eval: bool = False,
    _gicp: bool = False,
    _gicp_max_mahal: float = 9.0,
) -> "NewtonResult":
    """Newton registration on the fused kernel.

    ``inner_iters > 1`` re-uses each gather for several Newton steps (voxel
    assignments change negligibly between steps once the pose is within a
    fraction of the resolution — the same approximation as SVN shared-gather),
    cutting the gather-bound cost accordingly. ``inner_iters=1`` is exact
    DIRECT7 per step. A STALENESS BUDGET guards the reuse: once the
    cumulative step length since the gather exceeds a quarter of the voxel
    size, further inner steps freeze and the next outer iteration re-gathers
    — unbudgeted reuse walked registrations into wrong-neighbor basins on
    maps with thin far-range voxels (measured 0.005 -> 0.144 m at a 0.3 m
    initial offset with inner_iters=4).

    ``reg_pose`` (with ``cfg.reg_weight > 0``) adds the prior-pose
    regularization penalty to each step (NewtonConfig.reg_weight).

    Contract: by default the returned (score, hessian) are evaluated at the
    pose BEFORE the final retract — within ``trans_eps`` of the returned pose
    once converged (the extra gather+kernel launch would cost ~10% of the
    registration, and the apps consume the Hessian only as a converged-pose
    covariance). Pass ``final_eval=True`` to re-evaluate the objective at the
    RETURNED pose instead, matching the non-fused ``newton_align`` /
    ``newton_align_reg`` contract exactly (the reference prices factors off
    the converged-pose Hessian, run/pipeline.cpp:594-604). Pinned by
    tests/test_regmap.py::TestFusedContract.
    """
    from .constants import gauss_constants
    from .newton import NewtonResult, regularize_step

    d1, d2, _ = gauss_constants(cfg.resolution, cfg.outlier_ratio)
    if _gicp:
        # the kernel's d2 slot carries the squared correspondence-distance
        # gate in GICP mode (gicp_corr_dist_threshold analog)
        d2 = float(cfg.gicp_max_corr_dist) ** 2
    dtype = jnp.float32
    from .objective import sanitize_points

    # a NaN coordinate would poison the kernel's b/grad accumulators via
    # 0 * NaN even with a zero pair weight — zero it and drop it from the mask
    points, mask = sanitize_points(points, mask)
    ptsT = points.T.astype(dtype)

    def one_step(pose, megaT):
        obj = fused_objective(
            ptsT, megaT, pose, d1, d2, cfg.hess_lambda,
            gicp=_gicp, gicp_max_mahal=_gicp_max_mahal, interpret=interpret,
            block=block,
        )
        grad, hess = regularize_step(
            pose, obj.grad, obj.hess, obj.n_contrib, cfg, reg_pose
        )
        step = jnp.linalg.solve(hess, -grad)
        step = jnp.where(jnp.all(jnp.isfinite(step)), step, jnp.zeros_like(step))
        norm = jnp.linalg.norm(step)
        scale = jnp.where(
            norm > cfg.max_step_norm, cfg.max_step_norm / jnp.maximum(norm, 1e-30), 1.0
        )
        step = (cfg.step_size * scale) * step
        return se3.retract(pose, step.astype(dtype)), jnp.linalg.norm(step), obj

    def cond(state):
        _pose, it, converged, *_ = state
        return (it < cfg.max_iterations) & (~converged)

    stale_budget = jnp.asarray(cfg.gather_stale_frac * cfg.resolution, dtype)

    def body(state):
        pose, it, conv, score, hess, nc = state
        megaT = gather_megaT(
            points, mask, pose, regmap, grid_shape,
            kd_radius=getattr(cfg, "kd_radius", 0.0),
        )

        def inner(_, carry):
            pose_i, norm_i, obj_i, moved, napp = carry
            new_pose, stepn, obj2 = one_step(pose_i, megaT)
            # staleness budget: freeze once the pose has moved a quarter
            # eighth of a voxel... (the next outer iteration re-gathers);
            # frozen steps do NOT count toward the iteration budget
            ok = moved + stepn <= stale_budget
            pose_o = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_pose, pose_i
            )
            obj_o = jax.tree.map(lambda n, o: jnp.where(ok, n, o), obj2, obj_i)
            return (
                pose_o,
                jnp.where(ok, stepn, norm_i),
                obj_o,
                jnp.where(ok, moved + stepn, moved + stale_budget),
                napp + jnp.where(ok, 1, 0).astype(jnp.int32),
            )

        pose0, norm0, obj0 = one_step(pose, megaT)
        if inner_iters > 1:
            pose_f, norm_f, obj_f, _moved, n_applied = jax.lax.fori_loop(
                0, inner_iters - 1, inner,
                (pose0, norm0, obj0, norm0, jnp.asarray(1, jnp.int32)),
            )
        else:
            pose_f, norm_f, obj_f = pose0, norm0, obj0
            n_applied = jnp.asarray(1, jnp.int32)
        converged = norm_f < cfg.trans_eps
        # freeze once converged: under vmap (newton_align_fused_batch) the
        # lockstep while keeps executing body for finished lanes — their
        # state must not move, or batched results diverge from unbatched
        out = (pose_f, it + n_applied, conv | converged, obj_f.score,
               obj_f.hess, obj_f.n_contrib)
        old = (pose, it, conv, score, hess, nc)
        return jax.tree.map(lambda n, o: jnp.where(conv, o, n), out, old)

    init_state = (
        se3.cast(init_pose, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0.0, dtype),
        jnp.zeros((6, 6), dtype),
        jnp.asarray(0, jnp.int32),
    )
    pose, iters, converged, score, hess, nc = jax.lax.while_loop(cond, body, init_state)
    if final_eval:
        megaT = gather_megaT(
            points, mask, pose, regmap, grid_shape,
            kd_radius=getattr(cfg, "kd_radius", 0.0),
        )
        obj = fused_objective(
            ptsT, megaT, pose, d1, d2, cfg.hess_lambda,
            gicp=_gicp, gicp_max_mahal=_gicp_max_mahal, interpret=interpret,
            block=block,
        )
        score, hess, nc = obj.score, obj.hess, obj.n_contrib
    return NewtonResult(pose, hess, score, iters, converged, nc)


def newton_align_fused_batch(
    points: jax.Array,  # (B, N, 3) scans sharing one map
    mask: jax.Array,  # (B, N)
    regmap: RegMap,
    init_pose: Pose3,  # (B,)-batched Pose3
    cfg,  # NewtonConfig
    grid_shape: tuple,
    inner_iters: int = 1,
    interpret: bool = None,
    block: int = None,
    final_eval: bool = False,
) -> "NewtonResult":
    """Register B scans against ONE shared map in a single dispatch.

    Fills the chip when one scan's registration is gather-bound: the vmap
    batches the Pallas kernel over a leading grid axis and the per-scan
    6-dof Newton solves stay independent (the lockstep while_loop runs until
    every scan converges — iterations report the max). Throughput lever for
    the BASELINE reg/s target; per-scan accuracy equals the unbatched path.
    """
    return jax.vmap(
        lambda p, m, ip: newton_align_fused(
            p, m, regmap, ip, cfg, grid_shape, inner_iters,
            interpret=interpret, block=block, final_eval=final_eval,
        )
    )(points, mask, init_pose)
