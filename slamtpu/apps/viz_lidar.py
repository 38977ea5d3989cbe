"""LiDAR decode smoke-test (the reference ``viz_lidar_udp``,
/root/reference/run/viz_lidar_udp.cpp): decode packets into sweeps, project,
and export PLY point clouds for inspection (portable replacement for the PCL
viewer thread)."""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..lidar.ouster import FrameAssembler, FrameGrid, build_luts
from ..lidar.project import filters_from_params, project_frame
from ..runtime.config import PipelineConfig
from ..runtime.export import write_ply
from ..runtime.replay import STREAM_LIDAR, read_replay

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class VizLidarApp:
    cfg: PipelineConfig

    def __post_init__(self):
        self.luts = build_luts(self.cfg.meta, self.cfg.lidar)
        self.assembler = FrameAssembler(self.cfg.meta, self.luts)
        self.filters = filters_from_params(self.cfg.lidar)
        self.frames: List[FrameGrid] = []
        self._project = jax.jit(project_frame, static_argnames=("filters",))

    def run_replay(self, replay_path: str, max_frames: int = 10**9):
        for stream, _ts, payload in read_replay(replay_path):
            if stream != STREAM_LIDAR:
                continue
            frame = self.assembler.push_packet(payload)
            if frame is not None:
                self.frames.append(frame)
                if len(self.frames) >= max_frames:
                    break
        return self.frames

    def project(self, frame: FrameGrid):
        """Projected ScanBuffer of a decoded sweep (body frame)."""
        return self._project(
            jnp.asarray(frame.ranges_m),
            jnp.asarray(frame.reflectivity),
            jnp.asarray(frame.col_timestamp_s.astype(np.float32)),
            jnp.asarray(frame.col_valid),
            jnp.asarray(self.luts.direction),
            jnp.asarray(self.luts.offset),
            self.filters,
        )

    def export_frame(self, frame: FrameGrid, path: str):
        sb = self.project(frame)
        write_ply(np.asarray(sb.points), path, mask=np.asarray(sb.mask))
        return int(sb.num_points)
