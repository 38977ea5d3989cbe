"""INS-only georeferenced mapping + NDT map distribution export (the
reference ``pipeline_ins_map_distribution``,
/root/reference/run/pipeline_ins_map_distribution.cpp).

Accumulates INS-posed clouds into the incremental voxel sufficient-statistics
map (instead of the reference's accumulate-everything-then-downsample,
:281-341 — associative stats merge gives the same Gaussians stream-wise with
bounded memory), then finalizes and exports ellipsoid/voxel/summary text
files (:366-378 -> pipeline.hpp:163-274)."""
from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..mapping import gaussian_map
from ..runtime.config import PipelineConfig
from ..runtime.export import extract_ndt_data, write_ndt_data, write_ply
from .common import IngestPipeline, TrajectoryEntry, ins_pose_ned

log = logging.getLogger("slamtpu.ins_map")


@partial(jax.jit, static_argnames=("capacity",))
def _accumulate(stats, points, mask, pose, capacity: int):
    from ..mapping import voxel

    world = se3.transform_points(pose, points)
    new = gaussian_map.stats_from_points(
        world, mask, stats.origin, stats.resolution, capacity
    )
    # points outside the packed-key range (beyond GRID_DIM voxels from the
    # origin) silently drop from the stats — count them so long trajectories
    # cannot silently lose map content (distinct from capacity overflow)
    finite = jnp.all(jnp.isfinite(world), axis=-1)
    keys = voxel.key_of_points(
        world, stats.origin, 1.0 / stats.resolution, mask & finite
    )
    out_of_range = jnp.sum(
        (keys == voxel.INVALID_KEY) & mask & finite, dtype=jnp.int32
    )
    return gaussian_map.merge_stats(stats, new, capacity), out_of_range


@dataclasses.dataclass
class InsMapApp:
    cfg: PipelineConfig
    resolution: Optional[float] = None  # default: register.map_voxel_size

    def __post_init__(self):
        self.ingest = IngestPipeline(self.cfg)
        self.res = self.resolution or self.cfg.register.map_voxel_size
        self.trajectory: List[TrajectoryEntry] = []
        self._ref_lla = None
        self._stats = None
        self.out_of_range_points = 0  # points beyond the packed-key extent
        self._oor_pending: list = []  # device scalars awaiting a host sync
        self.viz = None  # Optional[common.VizHook] — set by the CLI's --viz

    def run_replay(self, replay_path: str, max_keyframes: int = 10**9):
        for synced in self.ingest.synced_frames(replay_path):
            self.process(synced)
            if len(self.trajectory) >= max_keyframes:
                break
        return self.trajectory

    def process(self, synced):
        scan = self.ingest.project(synced)
        nav = synced.ins[-1]
        if self._ref_lla is None:
            self._ref_lla = np.asarray(nav.lla)
        pose = ins_pose_ned(nav, self._ref_lla)
        if self._stats is None:
            grid_half = 512.0 * self.res
            origin = jnp.asarray(np.asarray(pose.trans) - grid_half, jnp.float32)
            self._stats = gaussian_map.stats_from_points(
                jnp.zeros((1, 3), jnp.float32),
                jnp.zeros(1, bool),
                origin,
                jnp.asarray(self.res, jnp.float32),
                self.cfg.register.map_capacity,
            )
        self._stats, oor = _accumulate(
            self._stats, scan.points, scan.mask, pose, self.cfg.register.map_capacity
        )
        # defer the host sync: forcing int(oor) per frame would serialize the
        # async dispatch pipeline; drain the counter every 16 keyframes
        self._oor_pending.append(oor)
        if len(self._oor_pending) >= 16:
            self._drain_oor(synced.scan.frame_id)
        if self.viz is not None:
            self.viz.push(self.viz.subsample(scan), pose, synced.scan.frame_id)
        self.trajectory.append(
            TrajectoryEntry(synced.t_end, synced.scan.frame_id, pose, pose)
        )

    def flush(self):
        """Drain deferred counters and block until the device map state is
        materialized (used by benches so rates measure work, not dispatch)."""
        self._drain_oor()
        if self._stats is not None:
            jax.block_until_ready(self._stats.n)

    def _drain_oor(self, frame_id=None):
        if not self._oor_pending:
            return
        total = int(np.sum([np.asarray(o) for o in self._oor_pending]))
        self._oor_pending.clear()
        if total:
            if self.out_of_range_points == 0:
                log.warning(
                    "frame %s: %d points beyond the map key range (+-512 voxels "
                    "from the first-pose origin) were dropped — the trajectory "
                    "has outgrown the grid; start a new map segment (checkpoint "
                    "+ fresh origin) to keep this content",
                    frame_id, total,
                )
            self.out_of_range_points += total

    def save_checkpoint(self, path: str):
        """Persist the mergeable map state + geodetic reference (the
        checkpoint/resume capability SURVEY.md section 5.4 calls for; the
        reference has end-of-run text export only)."""
        from ..runtime import checkpoint

        assert self._stats is not None, "nothing to checkpoint yet"
        checkpoint.save_ins_map(path, self._stats, self._ref_lla)

    def resume_from(self, path: str):
        """Restore a checkpoint; subsequent scans merge into the loaded map."""
        from ..runtime import checkpoint

        self._stats, self._ref_lla = checkpoint.load_ins_map(path)
        return self

    def finalize_and_export(self, prefix: str, min_points_per_voxel: int = 6):
        self._drain_oor()
        gmap = gaussian_map.finalize(self._stats, min_points_per_voxel)
        data = extract_ndt_data(gmap)
        write_ndt_data(data, prefix)
        valid = np.asarray(gmap.valid)
        write_ply(np.asarray(gmap.mean)[valid], f"{prefix}_means.ply")
        log.info(
            "exported %d valid voxels (%d points, overflow=%d, out_of_range=%d)",
            valid.sum(),
            int(np.asarray(self._stats.n).sum()),
            int(self._stats.overflow),
            self.out_of_range_points,
        )
        return gmap
