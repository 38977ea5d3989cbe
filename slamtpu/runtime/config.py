"""Typed configuration tree for the apps.

The reference parses four JSON files (lidar meta/config, imu config, register
config — SURVEY.md section 2.6) with paths hardcoded per main(). Here one
``PipelineConfig`` aggregates them with CLI-overridable fields, plus a
``berlin()`` preset mirroring the reference's shipped operating point
(/root/reference/config/*.json)."""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np

from ..ins.imu_config import ImuConfig
from ..lidar.ouster import LidarParams, SensorMeta, synthetic_os2_metadata


@dataclasses.dataclass(frozen=True)
class RegisterConfig:
    """cf. RegisterCallback::ParseParamdata
    (/root/reference/src/registercallback.cpp:24-91) and
    config/register_config.json."""

    method: str = "SVNNDT"  # NDT_OMP (-> Newton NDT) | SVNNDT | GICP (unsupported)
    ndt_resolution: float = 2.0
    ndt_transform_epsilon: float = 1e-4
    ndt_max_iterations: int = 30
    search_method: str = "DIRECT7"  # DIRECT7 | DIRECT1
    svn_resolution: float = 1.0
    svn_particles: int = 20
    svn_max_iterations: int = 100
    svn_kernel_h: float = 5.0
    svn_step_size: float = 0.05
    svn_stop_thresh: float = 1e-4
    svn_outlier_ratio: float = 0.55
    map_voxel_size: float = 0.5
    min_points_per_voxel: int = 6
    map_capacity: int = 1 << 17
    keyframe_window: int = 5  # target window of keyframes (lo_svn :328)
    use_regmap: bool = True  # search-free registration layout (ndt.regmap)
    reg_grid_shape: tuple = (256, 256, 64)  # dense-grid extent in voxels

    @classmethod
    def from_json(cls, obj: dict) -> "RegisterConfig":
        p = obj.get("register_parameter", obj)
        ndt = p.get("ndt", {})
        svn = p.get("svn_ndt", {})
        return cls(
            method=p.get("method", "SVNNDT"),
            ndt_resolution=float(ndt.get("resolution", 2.0)),
            ndt_transform_epsilon=float(ndt.get("epsilon", 1e-4)),
            search_method=ndt.get("searchMethod", "DIRECT7"),
            svn_resolution=float(svn.get("resolution", 1.0)),
            svn_particles=int(svn.get("particles", 20)),
            svn_max_iterations=int(svn.get("maxIterations", 100)),
            svn_kernel_h=float(svn.get("kernelH", 5.0)),
            svn_step_size=float(svn.get("stepSize", 0.05)),
            svn_stop_thresh=float(svn.get("stopThreshold", 1e-4)),
            svn_outlier_ratio=float(svn.get("outlierRatio", 0.55)),
            map_voxel_size=float(p.get("mapvoxelsize", 0.5)),
            # slamtpu extensions (absent from the reference JSON): fixed
            # device-buffer sizing — set capacity to the expected occupied
            # voxel count with headroom (regmap build cost scales with it)
            min_points_per_voxel=int(p.get("minPointsPerVoxel", 6)),
            map_capacity=int(p.get("mapCapacity", 1 << 17)),
            keyframe_window=int(p.get("keyframeWindow", 5)),
            use_regmap=bool(p.get("useRegmap", True)),
            reg_grid_shape=tuple(p.get("regGridShape", (256, 256, 64))),
        )


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    meta: SensorMeta
    lidar: LidarParams
    imu: ImuConfig
    register: RegisterConfig
    scan_points_capacity: int = 1 << 17  # padded device buffer per scan
    nav_window: int = 256
    deskew: bool = False  # INS-based motion compensation (lidar.deskew);
    #   off by default for parity (the reference computes alpha but never
    #   applies it, dataframe.hpp:406-433)

    @classmethod
    def berlin(cls, meta: Optional[SensorMeta] = None) -> "PipelineConfig":
        """The reference's Berlin operating point (config/*_berlin.json):
        OS-2-128 2048x10, stride 4 -> 32 beams, z in [-250, 0] OR refl >= 60,
        range [0, 250] m, 10.5 x 3 x 2.1 m vehicle box; SVN-NDT res 1.0,
        K=20, h=5.0, step 0.05; ndt res 2.0; map voxel 0.5."""
        return cls(
            meta=meta or synthetic_os2_metadata(),
            lidar=LidarParams(
                channel_stride=4,
                z_filter=(-250.0, 0.0),
                reflectivity_threshold=60.0,
                range_filter=(0.0, 250.0),
                vehicle_box_center=np.zeros(3, np.float32),
                vehicle_box_dimensions=np.asarray([10.5, 3.0, 2.1], np.float32),
            ),
            imu=ImuConfig(update_rate_hz=50.0),
            register=RegisterConfig(),
        )

    @classmethod
    def from_files(
        cls,
        meta_path: str,
        lidar_path: str,
        imu_path: str,
        register_path: str,
    ) -> "PipelineConfig":
        with open(register_path) as f:
            reg = RegisterConfig.from_json(json.load(f))
        return cls(
            meta=SensorMeta.from_file(meta_path),
            lidar=LidarParams.from_file(lidar_path),
            imu=ImuConfig.from_file(imu_path),
            register=reg,
        )
