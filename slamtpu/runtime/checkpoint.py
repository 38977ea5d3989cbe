"""Checkpoint / resume for maps and trajectories.

The reference has no persistence beyond end-of-run text exports (SURVEY.md
section 5.4). Here the map state is pure arrays (VoxelStats sufficient
statistics are associative and mergeable), so checkpointing is a plain
npz round-trip; a resumed run merges new scans into the restored stats.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..core import so3
from ..core.se3 import Pose3
from ..mapping.gaussian_map import VoxelStats


def save_map_stats(path: str, stats: VoxelStats):
    np.savez_compressed(
        path,
        keys=np.asarray(stats.keys),
        n=np.asarray(stats.n),
        sx=np.asarray(stats.sx),
        sxx=np.asarray(stats.sxx),
        origin=np.asarray(stats.origin),
        resolution=np.asarray(stats.resolution),
        overflow=np.asarray(stats.overflow),
    )


def load_map_stats(path: str) -> VoxelStats:
    z = np.load(path)
    return VoxelStats(
        keys=jnp.asarray(z["keys"]),
        n=jnp.asarray(z["n"]),
        sx=jnp.asarray(z["sx"]),
        sxx=jnp.asarray(z["sxx"]),
        origin=jnp.asarray(z["origin"]),
        resolution=jnp.asarray(z["resolution"]),
        overflow=jnp.asarray(z["overflow"]),
    )


def save_ins_map(path: str, stats: VoxelStats, ref_lla):
    """App-state checkpoint for the INS mapping pipeline: the mergeable map
    sufficient statistics plus the geodetic reference. A resumed run keeps
    folding scans into the restored stats (associative merge)."""
    np.savez_compressed(
        path,
        keys=np.asarray(stats.keys),
        n=np.asarray(stats.n),
        sx=np.asarray(stats.sx),
        sxx=np.asarray(stats.sxx),
        origin=np.asarray(stats.origin),
        resolution=np.asarray(stats.resolution),
        overflow=np.asarray(stats.overflow),
        ref_lla=np.asarray(ref_lla, np.float64),
    )


def load_ins_map(path: str):
    z = np.load(path)
    stats = VoxelStats(
        keys=jnp.asarray(z["keys"]),
        n=jnp.asarray(z["n"]),
        sx=jnp.asarray(z["sx"]),
        sxx=jnp.asarray(z["sxx"]),
        origin=jnp.asarray(z["origin"]),
        resolution=jnp.asarray(z["resolution"]),
        overflow=jnp.asarray(z["overflow"]),
    )
    return stats, z["ref_lla"]


def save_lo_svn(path: str, app):
    """Checkpoint the SVN LiDAR-odometry app: keyframe ring (world-frame
    clouds + masks + head), map origin, geodetic reference, PRNG key, and
    rebuild-cadence index. The device state is pure arrays, so a resumed run
    continues EXACTLY (the PRNG key makes SVN deterministic): split-run ==
    continuous-run, proven in tests/test_e2e.py::TestLoSvnResume."""
    app.flush()
    assert app._kf_points is not None, "nothing to checkpoint yet"
    np.savez_compressed(
        path,
        kf_points=np.asarray(app._kf_points),
        kf_mask=np.asarray(app._kf_mask),
        kf_head=np.asarray(app._kf_head),
        origin=np.asarray(app._origin),
        ref_lla=np.asarray(app._ref_lla, np.float64),
        key=np.asarray(app._key),
        cadence_idx=np.asarray(app._cadence._idx),
        n_keyframes=np.asarray(app._n_keyframes),
    )


def load_lo_svn(path: str, app):
    """Restore a save_lo_svn checkpoint into a freshly constructed app."""
    z = np.load(path)
    app._kf_points = jnp.asarray(z["kf_points"])
    app._kf_mask = jnp.asarray(z["kf_mask"])
    app._kf_head = int(z["kf_head"])
    app._origin = jnp.asarray(z["origin"])
    app._ref_lla = z["ref_lla"]
    app._key = jnp.asarray(z["key"])
    app._cadence._idx = int(z["cadence_idx"])
    app._cadence.force_next = True  # the RegMap cache is not persisted
    app._n_keyframes = int(z["n_keyframes"])
    return app


def save_trajectory(path: str, timestamps, poses: List[Pose3], frame_ids=None):
    quats = np.stack(
        [np.asarray(so3.rot_to_quat(jnp.asarray(p.rot))) for p in poses]
    )
    trans = np.stack([np.asarray(p.trans) for p in poses])
    np.savez_compressed(
        path,
        timestamps=np.asarray(timestamps, np.float64),
        quats=quats,
        trans=trans,
        frame_ids=np.asarray(frame_ids if frame_ids is not None else range(len(poses))),
    )


def load_trajectory(path: str):
    z = np.load(path)
    poses = [
        Pose3(so3.quat_to_rot(jnp.asarray(q)), jnp.asarray(t))
        for q, t in zip(z["quats"], z["trans"])
    ]
    return z["timestamps"], poses, z["frame_ids"]
