"""Fixed-capacity Gaussian voxel map (the NDT target grid), built on-device.

Replaces the reference's ``svn_ndt::VoxelGridCovariance`` two-pass robin_map
build (/root/reference/extern/svn_ndt/include/voxel_grid_covariance_impl.hpp:
163-379) with a sort + segment-sum construction over fixed-capacity padded
buffers:

  pass 1 (accumulate): pack voxel keys -> sort points by key -> segment-sum
          per-voxel N, sum(x), sum(x x^T)        (reference :163-249)
  pass 2 (finalize):  mean, sample covariance with Bessel correction,
          3x3 eigendecomposition, eigenvalue inflation at
          ``min_covar_eigvalue_mult * lambda_max``, inverse covariance and
          stability checks                        (reference :276-343)

Sufficient statistics (``VoxelStats``) are kept separate from the finalized
map (``GaussianMap``) so that incremental mapping merges stats associatively —
the same reduction shards across chips (segment-sum locally, gather/psum over
the mesh; see slamtpu.dist).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import linalg
from . import voxel

MIN_EIGENVALUE_THRESHOLD = 1e-12  # reference voxel_grid_covariance_impl.hpp:309
MAX_INVERSE_COEFF = 1e12  # reference voxel_grid_covariance_impl.hpp:337


class VoxelStats(NamedTuple):
    """Mergeable per-voxel sufficient statistics over a fixed capacity.

    ``keys`` is sorted ascending with INVALID_KEY padding; empty slots have
    ``n == 0``.
    """

    keys: jax.Array  # (V,) int32, sorted
    n: jax.Array  # (V,) int32
    sx: jax.Array  # (V, 3) sum of voxel-corner-relative points
    sxx: jax.Array  # (V, 3, 3) sum of their outer products
    origin: jax.Array  # (3,)
    resolution: jax.Array  # ()
    overflow: jax.Array  # () int32: distinct voxels dropped for capacity

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


class GaussianMap(NamedTuple):
    """Finalized NDT map: per-voxel Gaussian (mean, cov, icov) + validity."""

    keys: jax.Array  # (V,) int32 sorted (includes invalid-stat voxels)
    count: jax.Array  # (V,) int32
    mean: jax.Array  # (V, 3)
    cov: jax.Array  # (V, 3, 3) regularized covariance
    icov: jax.Array  # (V, 3, 3)
    evals: jax.Array  # (V, 3) ascending (inflated)
    evecs: jax.Array  # (V, 3, 3) columns
    valid: jax.Array  # (V,) bool
    origin: jax.Array  # (3,)
    resolution: jax.Array  # ()

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


def _segment_reduce(keys: jax.Array, points: jax.Array, capacity: int):
    """Sort by key and segment-sum sufficient statistics.

    keys: (N,) int32 (INVALID_KEY for masked-out points); points: (N, 3)
    expressed RELATIVE to each point's own voxel corner (see
    stats_from_points — larger offsets in float32 lose the covariance to
    catastrophic cancellation once |p|^2 >> cov entries).
    Returns (slot_keys, n, sx, sxx, overflow) over ``capacity`` slots.
    """
    order = jnp.argsort(keys)
    skeys = keys[order]
    spts = points[order]
    is_valid = skeys != voxel.INVALID_KEY
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]]
    ) & is_valid
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # -1 before first valid seg
    # invalid points and voxels beyond capacity land in the overflow bucket
    seg = jnp.where(is_valid & (seg >= 0) & (seg < capacity), seg, capacity)
    ones = jnp.ones_like(seg)
    n = jax.ops.segment_sum(ones, seg, num_segments=capacity + 1)[:capacity]
    sx = jax.ops.segment_sum(spts, seg, num_segments=capacity + 1)[:capacity]
    outer = spts[:, :, None] * spts[:, None, :]
    sxx = jax.ops.segment_sum(outer, seg, num_segments=capacity + 1)[:capacity]
    slot_keys = jax.ops.segment_max(
        skeys, seg, num_segments=capacity + 1
    )[:capacity]
    slot_keys = jnp.where(n > 0, slot_keys, voxel.INVALID_KEY)
    n_distinct = jnp.sum(first.astype(jnp.int32))
    overflow = jnp.maximum(n_distinct - capacity, 0)
    return slot_keys, n.astype(jnp.int32), sx, sxx, overflow


def stats_from_points(
    points: jax.Array,
    mask: jax.Array,
    origin: jax.Array,
    resolution: jax.Array,
    capacity: int,
) -> VoxelStats:
    """Accumulate per-voxel sufficient statistics from a padded point buffer.

    points: (N, 3); mask: (N,) bool marking real (non-padding, finite) points.

    Sufficient statistics accumulate VOXEL-CORNER-RELATIVE coordinates
    (magnitudes < resolution): in float32, larger offsets lose the voxel
    covariance to catastrophic cancellation in cov = E[xx] - E[x]E[x] — at
    origin-relative magnitudes of a few hundred meters (the Berlin grid is
    1024 m wide) the absolute rounding in sxx/n is ~1e-2 m^2, larger than
    the ~1e-4 m^2 surface-normal eigenvalue the registration accuracy rides
    on. ``finalize`` recovers each voxel's corner from its packed key and
    shifts the means back to world coordinates; covariances are
    translation-invariant.
    """
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    rel = points - origin.astype(points.dtype)[None, :]
    coords = jnp.floor(rel * (1.0 / resolution)).astype(jnp.int32)
    keys = voxel.pack(coords)
    keys = jnp.where(mask & finite, keys, voxel.INVALID_KEY)
    rel_v = rel - coords.astype(points.dtype) * resolution
    rel_v = jnp.where(finite[:, None], rel_v, 0.0)  # NaN/Inf must not poison sums
    slot_keys, n, sx, sxx, overflow = _segment_reduce(keys, rel_v, capacity)
    return VoxelStats(slot_keys, n, sx, sxx, origin, jnp.asarray(resolution), overflow)


def merge_stats(a: VoxelStats, b: VoxelStats, capacity: int | None = None) -> VoxelStats:
    """Merge two stats sets with the same origin/resolution (associative).

    Implemented as a merge of the two sorted slot arrays followed by a
    re-segmentation — this is the incremental-map update path (the reference
    instead rebuilds its whole grid per keyframe, run/pipeline_lo_svn.cpp:387).
    """
    capacity = capacity or max(a.capacity, b.capacity)
    keys = jnp.concatenate([a.keys, b.keys])
    order = jnp.argsort(keys)
    skeys = keys[order]
    n = jnp.concatenate([a.n, b.n])[order]
    sx = jnp.concatenate([a.sx, b.sx])[order]
    sxx = jnp.concatenate([a.sxx, b.sxx])[order]
    is_valid = skeys != voxel.INVALID_KEY
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]]
    ) & is_valid
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(is_valid & (seg >= 0) & (seg < capacity), seg, capacity)
    n_out = jax.ops.segment_sum(n, seg, num_segments=capacity + 1)[:capacity]
    sx_out = jax.ops.segment_sum(sx, seg, num_segments=capacity + 1)[:capacity]
    sxx_out = jax.ops.segment_sum(sxx, seg, num_segments=capacity + 1)[:capacity]
    keys_out = jax.ops.segment_max(skeys, seg, num_segments=capacity + 1)[:capacity]
    keys_out = jnp.where(n_out > 0, keys_out, voxel.INVALID_KEY)
    n_distinct = jnp.sum(first.astype(jnp.int32))
    overflow = a.overflow + b.overflow + jnp.maximum(n_distinct - capacity, 0)
    return VoxelStats(keys_out, n_out, sx_out, sxx_out, a.origin, a.resolution, overflow)


def finalize(
    stats: VoxelStats,
    min_points_per_voxel: int = 6,
    min_covar_eigvalue_mult: float = 0.01,
) -> GaussianMap:
    """Finalize sufficient statistics into the NDT Gaussian map.

    Mirrors /root/reference/extern/svn_ndt/include/voxel_grid_covariance_impl.hpp:
    276-343: Bessel-corrected sample covariance, eigenvalue inflation below
    ``min_covar_eigvalue_mult * lambda_max``, inverse-covariance stability
    checks, and the >= 3 points floor enforced by setMinPointPerVoxel
    (voxel_grid_covariance.h:176-184).
    """
    min_points_per_voxel = max(min_points_per_voxel, 3)
    n = stats.n
    nf = jnp.maximum(n, 1).astype(stats.sx.dtype)
    # stats are voxel-corner-relative (see stats_from_points); covariance is
    # translation-invariant, the mean shifts back to world coordinates via
    # the corner recovered from the packed key (INVALID_KEY slots unpack to
    # a large but finite corner; their icov is zeroed below so gathers
    # through them contribute nothing)
    corner = (
        voxel.unpack(jnp.where(stats.keys == voxel.INVALID_KEY, 0, stats.keys))
        .astype(stats.sx.dtype)
        * stats.resolution.astype(stats.sx.dtype)
        + stats.origin.astype(stats.sx.dtype)[None, :]
    )
    rel_mean = stats.sx / nf[:, None]
    mean = rel_mean + corner
    cov = stats.sxx / nf[:, None, None] - rel_mean[:, :, None] * rel_mean[:, None, :]
    bessel = nf / jnp.maximum(nf - 1.0, 1.0)
    cov = cov * bessel[:, None, None]

    evals, evecs = linalg.sym_eig3x3(cov)
    # Discard non-PSD / near-singular voxels (reference :305-313)
    psd_ok = (
        (evals[:, 0] >= 0.0)
        & (evals[:, 1] >= 0.0)
        & (evals[:, 2] >= MIN_EIGENVALUE_THRESHOLD)
    )
    # Inflate small eigenvalues (reference :315-331)
    min_acceptable = jnp.maximum(
        MIN_EIGENVALUE_THRESHOLD, evals[:, 2] * min_covar_eigvalue_mult
    )
    evals = jnp.maximum(evals, min_acceptable[:, None])
    cov = jnp.einsum("vij,vj,vkj->vik", evecs, evals, evecs)
    icov = linalg.inv3x3(cov)
    icov_ok = jnp.all(jnp.isfinite(icov), axis=(1, 2)) & (
        jnp.max(jnp.abs(icov), axis=(1, 2)) <= MAX_INVERSE_COEFF
    )
    valid = (n >= min_points_per_voxel) & psd_ok & icov_ok
    # Neutralize invalid slots so gathers through them contribute nothing.
    icov = jnp.where(valid[:, None, None], icov, 0.0)
    return GaussianMap(
        keys=stats.keys,
        count=n,
        mean=mean,
        cov=cov,
        icov=icov,
        evals=evals,
        evecs=evecs,
        valid=valid,
        origin=stats.origin,
        resolution=stats.resolution,
    )


def origin_for(
    points: jax.Array, mask: jax.Array, resolution: float, margin_voxels: int = 64
) -> jax.Array:
    """Pick a map origin (lower corner) so the masked points sit well inside
    the [0, GRID_DIM)^3 key range, snapped to the voxel lattice."""
    big = jnp.asarray(jnp.inf, points.dtype)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    return (jnp.floor(pmin / resolution) - margin_voxels) * resolution


def recenter_origin(
    origin, position, resolution: float, grid_dim: int = None, threshold_frac: float = 0.5
):
    """Shift the map origin when ``position`` strays from the key-range
    center (packed keys cover GRID_DIM voxels per axis — ±512 m at 1 m
    resolution). Per-keyframe map rebuilds make the shift free: the next
    build simply keys against the new origin. Returns (new_origin, shifted)."""
    import numpy as np

    from . import voxel as voxel_mod

    grid_dim = grid_dim or voxel_mod.GRID_DIM
    half = 0.5 * grid_dim * float(resolution)
    center = np.asarray(origin, np.float64) + half
    off = np.asarray(position, np.float64) - center
    if np.max(np.abs(off)) <= threshold_frac * half:
        return origin, False
    new_origin = (np.floor((np.asarray(position) - half) / resolution)) * resolution
    return jnp.asarray(new_origin, jnp.asarray(origin).dtype), True


def build_map(
    points: jax.Array,
    mask: jax.Array,
    origin: jax.Array,
    resolution: float,
    capacity: int,
    min_points_per_voxel: int = 6,
    min_covar_eigvalue_mult: float = 0.01,
) -> GaussianMap:
    """One-shot map build: stats + finalize (the per-keyframe setInputTarget
    path, /root/reference/extern/svn_ndt/include/svn_ndt.h:213-251)."""
    stats = stats_from_points(points, mask, origin, jnp.asarray(resolution), capacity)
    return finalize(stats, min_points_per_voxel, min_covar_eigvalue_mult)
