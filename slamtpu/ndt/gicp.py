"""Voxelized GICP registration (the reference's GICP method option,
/root/reference/src/registercallback.cpp:24-91 via pclomp::gicp_omp).

TPU-native formulation follows VGICP (Koide et al.): correspondences come
from the voxel grid instead of per-point KD-tree nearest neighbors, and each
point-voxel pair contributes the plane-to-plane Mahalanobis cost

    e = r^T (C_voxel + R C_src R^T)^-1 r,   r = T p - mu

with an isotropic source covariance C_src = sigma^2 I (rotation-invariant, so
the combined inverse (C_voxel + sigma^2 I)^-1 is baked per voxel at map-build
time). Gradients/Hessian reuse the SE(3)-tangent machinery of the NDT
objective; the Newton loop minimizes the cost (sign-flipped into the common
maximize convention so slamtpu.ndt.newton is reused unchanged).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import linalg
from ..mapping.gaussian_map import GaussianMap
from . import regmap as regmap_mod
from .newton import NewtonConfig, NewtonResult, _newton_loop
from .objective import NdtObjective, point_jacobian


def gicp_map(gmap: GaussianMap, source_noise_sigma: float = 0.05) -> GaussianMap:
    """Clone the Gaussian map with icov = (cov + sigma^2 I)^-1 — after this,
    the GICP cost is evaluated by the same gather/math path as NDT."""
    fused = gmap.cov + (source_noise_sigma**2) * jnp.eye(3, dtype=gmap.cov.dtype)
    icov = linalg.inv3x3(fused)
    icov = jnp.where(gmap.valid[:, None, None], icov, 0.0)
    return gmap._replace(icov=icov)


def score_grad_hess_gicp(
    points: jax.Array,
    mask: jax.Array,
    pose,
    regmap: regmap_mod.RegMap,
    grid_shape: tuple,
    hess_lambda: float = 1e-6,
    max_mahal: float = 9.0,
    max_corr_dist: float = 5.0,
) -> NdtObjective:
    """GICP cost (negated, so it is maximized like the NDT score).

    ``max_mahal`` gates outlier pairs (pairs beyond 3 sigma contribute
    nothing — the robustness analog of NDT's bounded exp weight).
    ``max_corr_dist`` is the reference's Euclidean correspondence-distance
    gate (gicp_corr_dist_threshold, src/registercallback.cpp:56-61); voxel
    correspondences sit within ~1.5x resolution, so the 5 m default is
    inactive and the knob only bites when tightened below that.
    Expects a RegMap built from ``gicp_map(...)``.
    """
    from .objective import sanitize_points

    points, mask = sanitize_points(points, mask)
    tp, mu, icov, active = regmap_mod.gather_pair_data(
        points, mask, pose, regmap, grid_shape
    )
    icx, _factor, _sp, _ok, mahal = regmap_mod._pair_math(
        tp, mu, icov, active, d1=-1.0, d2=2.0
    )
    dist2 = jnp.sum((tp[:, None, :] - mu) ** 2, axis=-1)
    inlier = (
        active
        & (mahal <= max_mahal)
        & (dist2 <= max_corr_dist**2)
        & jnp.isfinite(mahal)
    )
    w = inlier.astype(points.dtype)

    J = point_jacobian(points, pose)
    b = jnp.einsum("nk,nki->ni", w, icx)
    M = jnp.einsum("nk,nkij->nij", w, icov)
    # maximize score = -sum(mahal); grad = -2 J^T icov r; H_GN = -2 J^T icov J
    grad = -2.0 * jnp.einsum("nia,ni->a", J, b)
    hess = -2.0 * jnp.einsum("nia,nij,njb->ab", J, M, J)
    hess = hess + hess_lambda * jnp.eye(6, dtype=hess.dtype)
    score = -jnp.sum(jnp.where(inlier, mahal, 0.0))
    return NdtObjective(score, grad, hess, jnp.sum(inlier, dtype=jnp.int32))


def gicp_align(
    points: jax.Array,
    mask: jax.Array,
    regmap: regmap_mod.RegMap,
    init_pose,
    cfg: NewtonConfig = NewtonConfig(),
    grid_shape: tuple = (256, 256, 64),
) -> NewtonResult:
    """Newton VGICP alignment (regmap must come from gicp_map + build_regmap)."""

    def eval_obj(pose):
        return score_grad_hess_gicp(
            points, mask, pose, regmap, grid_shape, cfg.hess_lambda,
            max_corr_dist=cfg.gicp_max_corr_dist,
        )

    return _newton_loop(eval_obj, points.dtype, init_pose, cfg)


# --- anisotropic-source (plane-to-plane) GICP -------------------------------
#
# The isotropic mode above bakes C_src = sigma^2 I into the map, discarding
# the source scan's surface anisotropy — the defining feature of gicp_omp's
# plane-to-plane cost (the reference's GICP engine, registercallback.cpp:
# 56-61). This mode computes per-point source covariances from the source
# scan's OWN voxel statistics and fuses (C_tgt + R C_src R^T)^-1 per pair.


def regularize_plane_covariance(cov: jax.Array, eps: float = 1e-3) -> jax.Array:
    """GICP covariance regularization: eigenvalues replaced by (eps, 1, 1)
    keeping eigenvectors — every Gaussian becomes a disc with its normal
    direction squashed to eps (gicp_omp's surface model; Segal et al.)."""
    evals, evecs = linalg.sym_eig3x3(cov)  # ascending
    new_vals = jnp.broadcast_to(
        jnp.asarray([eps, 1.0, 1.0], cov.dtype), evals.shape
    )
    return jnp.einsum("...ij,...j,...kj->...ik", evecs, new_vals, evecs)


def gicp_map_aniso(gmap: GaussianMap, eps: float = 1e-3) -> GaussianMap:
    """Target map for anisotropic GICP: the payload's icov slot carries the
    plane-REGULARIZED COVARIANCE instead of an inverse — fusion with the
    rotated source covariance and the 3x3 inversion happen per pair at
    evaluation time (score_grad_hess_gicp_aniso)."""
    cov_r = regularize_plane_covariance(gmap.cov, eps)
    cov_r = jnp.where(gmap.valid[:, None, None], cov_r, 0.0)
    return gmap._replace(icov=cov_r)


def source_point_covariances(
    points: jax.Array,
    mask: jax.Array,
    resolution,
    capacity: int = 8192,
    min_points_per_voxel: int = 4,
    fallback_sigma: float = 0.05,
    eps: float = 1e-3,
) -> jax.Array:
    """(N, 3, 3) per-point source covariances: each point inherits the
    plane-regularized covariance of ITS OWN voxel in the source scan (the
    voxelized analog of gicp_omp's per-point kNN covariances). Points in
    sparse voxels fall back to the isotropic sigma^2 I."""
    from ..mapping import gaussian_map, voxel

    dtype = points.dtype
    big = jnp.asarray(1e6, dtype)
    masked = jnp.where(mask[:, None], points, big)
    origin = (
        jnp.floor(jnp.min(masked, axis=0) / resolution) - 1.0
    ) * resolution
    gmap_src = gaussian_map.build_map(
        points, mask, origin, resolution,
        capacity=capacity, min_points_per_voxel=min_points_per_voxel,
    )
    keys = voxel.key_of_points(points, origin, 1.0 / resolution, mask)
    slot, found = voxel.lookup(gmap_src.keys, keys)
    good = found & gmap_src.valid[slot]
    cov = regularize_plane_covariance(gmap_src.cov[slot], eps)
    iso = (fallback_sigma**2) * jnp.eye(3, dtype=dtype)
    return jnp.where(good[:, None, None], cov, iso)


def score_grad_hess_gicp_aniso_gathered(
    points: jax.Array,  # (N, 3) body frame, already sanitized
    src_cov: jax.Array,  # (N, 3, 3) body-frame source covariances
    pose,
    mu: jax.Array,  # (N, 7, 3) pre-gathered target means
    cov_t: jax.Array,  # (N, 7, 3, 3) pre-gathered plane-regularized target covs
    active: jax.Array,  # (N, 7)
    hess_lambda: float = 1e-6,
    max_mahal: float = 9.0,
    max_corr_dist: float = 5.0,
) -> NdtObjective:
    """Plane-to-plane GICP cost on pre-gathered target Gaussians (the
    shared-gather / SVN-polish path: neighbor sets come from a nearby pose,
    contributions use this pose's exact transform)."""
    from ..core import se3

    tp = se3.transform_points(pose, points)
    R = pose.rot
    rc = jnp.einsum("ab,nbc,dc->nad", R, src_cov, R)  # R C_src R^T
    fused_inv = linalg.inv3x3(cov_t + rc[:, None, :, :])
    r = tp[:, None, :] - mu
    icx = jnp.einsum("nkij,nkj->nki", fused_inv, r)
    mahal = jnp.maximum(jnp.einsum("nki,nki->nk", r, icx), 0.0)
    dist2 = jnp.sum(r**2, axis=-1)
    inlier = (
        active & (mahal <= max_mahal) & (dist2 <= max_corr_dist**2)
        & jnp.isfinite(mahal)
    )
    w = inlier.astype(points.dtype)

    J = point_jacobian(points, pose)
    b = jnp.einsum("nk,nki->ni", w, icx)
    M = jnp.einsum("nk,nkij->nij", w, fused_inv)
    grad = -2.0 * jnp.einsum("nia,ni->a", J, b)
    hess = -2.0 * jnp.einsum("nia,nij,njb->ab", J, M, J)
    hess = hess + hess_lambda * jnp.eye(6, dtype=hess.dtype)
    score = -jnp.sum(jnp.where(inlier, mahal, 0.0))
    return NdtObjective(score, grad, hess, jnp.sum(inlier, dtype=jnp.int32))


def score_grad_hess_gicp_aniso(
    points: jax.Array,
    mask: jax.Array,
    src_cov: jax.Array,  # (N, 3, 3) body-frame source covariances
    pose,
    regmap: regmap_mod.RegMap,  # from gicp_map_aniso + build_regmap
    grid_shape: tuple,
    hess_lambda: float = 1e-6,
    max_mahal: float = 9.0,
    max_corr_dist: float = 5.0,
) -> NdtObjective:
    """Plane-to-plane GICP cost: e = r^T (C_tgt + R C_src R^T)^-1 r per
    point-voxel pair, negated into the maximize convention. Gauss-Newton
    treats the fused covariance as fixed at the evaluation pose (the same
    approximation gicp_omp's optimizer makes per iteration)."""
    from .objective import sanitize_points

    points, mask = sanitize_points(points, mask)
    _tp, mu, cov_t, active = regmap_mod.gather_pair_data(
        points, mask, pose, regmap, grid_shape
    )
    return score_grad_hess_gicp_aniso_gathered(
        points, src_cov, pose, mu, cov_t, active, hess_lambda,
        max_mahal, max_corr_dist,
    )


def gicp_align_aniso(
    points: jax.Array,
    mask: jax.Array,
    src_cov: jax.Array,
    regmap: regmap_mod.RegMap,
    init_pose,
    cfg: NewtonConfig = NewtonConfig(),
    grid_shape: tuple = (256, 256, 64),
) -> NewtonResult:
    """Newton plane-to-plane GICP (regmap from gicp_map_aniso + build_regmap,
    src_cov from source_point_covariances)."""

    def eval_obj(pose):
        return score_grad_hess_gicp_aniso(
            points, mask, src_cov, pose, regmap, grid_shape, cfg.hess_lambda,
            max_corr_dist=cfg.gicp_max_corr_dist,
        )

    return _newton_loop(eval_obj, points.dtype, init_pose, cfg)
