"""Offline export / analysis artifacts.

Equivalents of the reference's end-of-run exports:
- NDT map export (ellipsoids / voxel stats / raw points text files),
  /root/reference/include/pipeline.hpp:163-274
- compass CSV archive for IMU calibration, pipeline.hpp:341-431
- PLY point-cloud export (replaces the PCL visualizer as the portable way to
  inspect clouds; viz was not performance-relevant, SURVEY.md section 2.3)
"""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..ins.anpp import NavFrame
from ..mapping.gaussian_map import GaussianMap


@dataclasses.dataclass
class NdtExportData:
    """Per-valid-voxel Gaussian summaries (reference NdtEllipsoid/NdtVoxel)."""

    means: np.ndarray  # (V, 3)
    evals: np.ndarray  # (V, 3) ascending
    evecs: np.ndarray  # (V, 3, 3) columns
    counts: np.ndarray  # (V,)


def extract_ndt_data(gmap: GaussianMap) -> NdtExportData:
    """Pull mean/evecs/evals/count per valid leaf (reference extractNdtData,
    pipeline.hpp:163-222)."""
    valid = np.asarray(gmap.valid)
    return NdtExportData(
        means=np.asarray(gmap.mean)[valid],
        evals=np.asarray(gmap.evals)[valid],
        evecs=np.asarray(gmap.evecs)[valid],
        counts=np.asarray(gmap.count)[valid],
    )


def write_ndt_data(data: NdtExportData, prefix: str):
    """Three text files like writeNdtDataToFiles (pipeline.hpp:224-274):
    <prefix>_ellipsoids.txt, <prefix>_voxels.txt, <prefix>_summary.txt."""
    with open(f"{prefix}_ellipsoids.txt", "w") as f:
        f.write("# mean_x mean_y mean_z eval1 eval2 eval3 evec_colmajor(9)\n")
        for m, ev, evec in zip(data.means, data.evals, data.evecs):
            cols = " ".join(f"{v:.9g}" for v in evec.T.ravel())
            f.write(
                f"{m[0]:.9g} {m[1]:.9g} {m[2]:.9g} "
                f"{ev[0]:.9g} {ev[1]:.9g} {ev[2]:.9g} {cols}\n"
            )
    with open(f"{prefix}_voxels.txt", "w") as f:
        f.write("# mean_x mean_y mean_z count\n")
        for m, c in zip(data.means, data.counts):
            f.write(f"{m[0]:.9g} {m[1]:.9g} {m[2]:.9g} {int(c)}\n")
    with open(f"{prefix}_summary.txt", "w") as f:
        f.write(f"valid_voxels {len(data.counts)}\n")
        f.write(f"total_points {int(data.counts.sum())}\n")


def write_compass_csv(frames: List[NavFrame], path: str):
    """Full NavFrame archive CSV sorted by timestamp (reference
    writeCompasToFile, pipeline.hpp:341-431)."""
    frames = sorted(frames, key=lambda f: f.t)
    cols = (
        ["t"]
        + [f"lla_{c}" for c in "012"]
        + [f"vel_ned_{c}" for c in "012"]
        + [f"quat_{c}" for c in "0123"]
        + [f"rpy_{c}" for c in "012"]
        + [f"accel_nav_{c}" for c in "012"]
        + [f"gyro_nav_{c}" for c in "012"]
        + ["g_force"]
        + [f"sigma_pos_{c}" for c in "012"]
        + [f"sigma_vel_{c}" for c in "012"]
        + [f"sigma_rpy_{c}" for c in "012"]
        + [f"imu_accel_{c}" for c in "012"]
        + [f"imu_gyro_{c}" for c in "012"]
        + [f"mag_{c}" for c in "012"]
        + [f"env_{c}" for c in "012"]
        + ["t29"]
        + [f"lla29_{c}" for c in "012"]
        + [f"vel29_{c}" for c in "012"]
        + [f"sigma_pos29_{c}" for c in "012"]
        + [f"tilt_heading29_{c}" for c in "0123"]
        + ["fail_bits", "init_bits", "fix_status", "fix_status29"]
    )
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for fr in frames:
            vals = (
                [fr.t]
                + list(fr.lla)
                + list(fr.vel_ned)
                + list(fr.quat)
                + list(fr.rpy)
                + list(fr.accel_nav)
                + list(fr.gyro_nav)
                + [fr.g_force]
                + list(fr.sigma_pos)
                + list(fr.sigma_vel)
                + list(fr.sigma_rpy)
                + list(fr.imu_accel)
                + list(fr.imu_gyro)
                + list(fr.mag)
                + list(fr.env)
                + [fr.t29]
                + list(fr.lla29)
                + list(fr.vel29)
                + list(fr.sigma_pos29)
                + list(fr.tilt_heading29)
                + [fr.fail_bits, fr.init_bits, fr.fix_status, fr.fix_status29]
            )
            f.write(",".join(f"{v:.12g}" if isinstance(v, float) else str(v) for v in vals) + "\n")


def write_ply(points: np.ndarray, path: str, mask=None):
    """ASCII PLY export (portable replacement for the PCL viewer)."""
    pts = points if mask is None else points[np.asarray(mask)]
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
        )
        for p in pts:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


def write_trajectory_tum(path: str, stamps, poses):
    """TUM-format trajectory (timestamp tx ty tz qx qy qz qw) for ATE tooling."""
    from ..core import so3
    import jax.numpy as jnp

    with open(path, "w") as f:
        for t, pose in zip(stamps, poses):
            q = np.asarray(so3.rot_to_quat(jnp.asarray(pose.rot)))
            tr = np.asarray(pose.trans)
            f.write(
                f"{t:.9f} {tr[0]:.6f} {tr[1]:.6f} {tr[2]:.6f} "
                f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
            )
