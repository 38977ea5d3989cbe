"""Coarse-to-fine multi-resolution NDT alignment.

Analog of the reference's multigrid NDT variant (tier4 multigrid_ndt_omp,
compiled into its pipeline at /root/reference/CMakeLists.txt:41-46): the same
scan is registered against Gaussian maps of decreasing voxel size, each level
seeding the next. Coarse levels enlarge the convergence basin (voxel-sized
attraction wells), fine levels give the final accuracy, and each level needs
only a few Newton iterations — usually cheaper and more robust than one
long fine-level optimization from a poor initial guess.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax

from ..core.se3 import Pose3
from ..mapping import gaussian_map
from .newton import NewtonConfig, NewtonResult, newton_align_reg
from .regmap import RegMap, build_regmap


class MultiResLevel(NamedTuple):
    regmap: RegMap
    grid_shape: Tuple[int, int, int]
    cfg: NewtonConfig


def build_pyramid(
    points: jax.Array,
    mask: jax.Array,
    origin: jax.Array,
    resolutions: Sequence[float],
    capacity: int,
    grid_shape: Tuple[int, int, int] = (256, 256, 64),
    min_points_per_voxel: int = 6,
    max_iterations: Sequence[int] | None = None,
) -> list:
    """Build a map pyramid (coarse -> fine) from one target cloud."""
    resolutions = sorted(resolutions, reverse=True)
    iters = max_iterations or [10] * (len(resolutions) - 1) + [20]
    if len(iters) != len(resolutions):
        raise ValueError(
            f"max_iterations has {len(iters)} entries for {len(resolutions)} "
            "resolutions — zip truncation would silently drop pyramid levels"
        )
    levels = []
    for res, it in zip(resolutions, iters):
        gmap = gaussian_map.build_map(
            points, mask, origin, res, capacity=capacity,
            min_points_per_voxel=min_points_per_voxel,
        )
        regmap = build_regmap(gmap, grid_shape=grid_shape)
        levels.append(
            MultiResLevel(
                regmap,
                grid_shape,
                NewtonConfig(resolution=res, max_iterations=it, trans_eps=1e-3),
            )
        )
    return levels


def multires_align(
    points: jax.Array,
    mask: jax.Array,
    levels: Sequence[MultiResLevel],
    init_pose: Pose3,
) -> NewtonResult:
    """Align through the pyramid; returns the finest level's result."""
    pose = init_pose
    result = None
    for lvl in levels:
        result = newton_align_reg(
            points, mask, lvl.regmap, pose, lvl.cfg, lvl.grid_shape
        )
        pose = result.pose
    return result
