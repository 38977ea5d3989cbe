from . import voxel
from .downsample import axis_crop, voxel_downsample
from .gaussian_map import GaussianMap, VoxelStats, build_map, finalize, merge_stats, stats_from_points

__all__ = [
    "voxel_downsample",
    "axis_crop",
    "voxel",
    "GaussianMap",
    "VoxelStats",
    "build_map",
    "finalize",
    "merge_stats",
    "stats_from_points",
]
