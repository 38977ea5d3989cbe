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


def save_odom_ndt(path: str, app):
    """Checkpoint the Newton-NDT odometry app (apps.odom_ndt.OdomNdtApp).

    The entire odometry state is the device-resident carry pytree (window
    ring + previous keyframe cloud) plus host scalars (trust gain, origin,
    geodetic reference, PRNG key for the SVNNDT engine), so a resumed run
    continues exactly: split-run == continuous-run, proven in
    tests/test_e2e.py::TestOdomResume. The loop-closure detector is NOT
    persisted (mirror of lo_svn's accepted scope)."""
    app.flush()
    assert app._carry is not None, "nothing to checkpoint yet"
    carry_np = {f"carry_{k}": np.asarray(v) for k, v in app._carry.items()}
    was_denied, trust = app._trust
    np.savez_compressed(
        path,
        origin=np.asarray(app._origin, np.float64),
        ref_lla=np.asarray(app._ref_lla, np.float64),
        trust=np.asarray([1.0 if was_denied else 0.0, trust], np.float64),
        n_keyframes=np.asarray(app._n_keyframes),
        key=np.asarray(app._key) if app._key is not None else np.zeros(0, np.uint32),
        # previous-keyframe INS pose (rot | trans columns): the INS-relative
        # registration seed; absent in pre-round-5 checkpoints (the first
        # resumed keyframe then falls back to the const-velocity seed)
        prev_ins=np.concatenate(
            [app._prev_ins[0], app._prev_ins[1][:, None]], axis=1
        )
        if app._prev_ins is not None
        else np.zeros((0, 4)),
        **carry_np,
    )


def load_odom_ndt(path: str, app):
    """Restore a save_odom_ndt checkpoint into a freshly constructed app."""
    z = np.load(path)
    app._carry = {
        k[len("carry_"):]: jnp.asarray(z[k]) for k in z.files if k.startswith("carry_")
    }
    app._origin = z["origin"]
    app._ref_lla = z["ref_lla"]
    app._trust = (bool(z["trust"][0] > 0.5), float(z["trust"][1]))
    app._n_keyframes = int(z["n_keyframes"])
    if z["key"].size:
        app._key = jnp.asarray(z["key"])
    if "prev_ins" in z.files and z["prev_ins"].size:
        app._prev_ins = (
            z["prev_ins"][:, :3].copy(), z["prev_ins"][:, 3].copy()
        )
    return app


def save_ligo_tc(path: str, app):
    """Checkpoint the tightly-coupled app (apps.ligo_tc.LigoTcApp): the nav
    window (poses/vel/bias/INS priors/between factors/preintegration deltas),
    the keyframe registration ring with its slot->window aliasing, trust
    gain, origin, gravity, and geodetic reference. Split-run ==
    continuous-run proven in tests/test_e2e.py::TestLigoResume (the RegMap
    cache is rebuilt on the first resumed keyframe, like lo_svn)."""
    assert app._kf_clouds is not None, "nothing to checkpoint yet"
    win = app._win
    n = len(win)
    zeros33 = np.zeros((3, 3))
    pim_keys = ("dR", "dv", "dp", "dR_dbg", "dv_dba", "dv_dbg", "dp_dba", "dp_dbg",
                "bias_hat", "cov")
    pim_defaults = dict(
        dR=zeros33, dv=np.zeros(3), dp=np.zeros(3), dR_dbg=zeros33,
        dv_dba=zeros33, dv_dbg=zeros33, dp_dba=zeros33, dp_dbg=zeros33,
        bias_hat=np.zeros(6), cov=np.zeros((15, 15)),
    )

    def stk(get, default):
        return np.stack([np.asarray(get(w), np.float64) if get(w) is not None
                         else default for w in win])

    win_arrays = dict(
        win_rot=stk(lambda w: w["pose"][0], zeros33),
        win_trans=stk(lambda w: w["pose"][1], np.zeros(3)),
        win_vel=stk(lambda w: w["vel"], np.zeros(3)),
        win_bias=stk(lambda w: w["bias"], np.zeros(6)),
        win_ins_rot=stk(lambda w: w["ins"][0][0], zeros33),
        win_ins_trans=stk(lambda w: w["ins"][0][1], np.zeros(3)),
        win_ins_sigma=stk(lambda w: w["ins"][1], np.zeros(6)),
        win_ins_vel=stk(lambda w: w["ins_vel"], np.zeros(3)),
        win_has_pim=np.asarray([w["pim"] is not None for w in win]),
        win_pim_dt=np.asarray(
            [w["pim"]["dt"] if w["pim"] is not None else 0.0 for w in win]
        ),
        win_has_rel=np.asarray([w["rel"] is not None for w in win]),
        win_rel_rot=stk(lambda w: w["rel"][0] if w["rel"] is not None else None, zeros33),
        win_rel_trans=stk(lambda w: w["rel"][1] if w["rel"] is not None else None,
                          np.zeros(3)),
        win_rel_cov=stk(lambda w: w["rel_cov"], np.zeros((6, 6))),
    )
    for k in pim_keys:
        win_arrays[f"win_pim_{k}"] = np.stack(
            [np.asarray(w["pim"][k], np.float64) if w["pim"] is not None
             else pim_defaults[k] for w in win]
        )
    # ring slots: index into the live window when aliased, else a frozen pose
    slot_win_idx = np.full(len(app._kf_slots), -1, np.int64)
    slot_used = np.zeros(len(app._kf_slots), bool)
    slot_rot = np.stack([np.eye(3)] * len(app._kf_slots))
    slot_trans = np.zeros((len(app._kf_slots), 3))
    win_ids = {id(w): k for k, w in enumerate(win)}
    for s, entry in enumerate(app._kf_slots):
        if entry is None:
            continue
        slot_used[s] = True
        if id(entry) in win_ids:
            slot_win_idx[s] = win_ids[id(entry)]
        else:
            slot_rot[s] = np.asarray(entry["pose"][0], np.float64)
            slot_trans[s] = np.asarray(entry["pose"][1], np.float64)
    was_denied, trust = app._trust
    np.savez_compressed(
        path,
        n_win=np.asarray(n),
        kf_clouds=np.asarray(app._kf_clouds),
        kf_masks=np.asarray(app._kf_masks),
        kf_head=np.asarray(app._kf_head),
        slot_win_idx=slot_win_idx,
        slot_used=slot_used,
        slot_rot=slot_rot,
        slot_trans=slot_trans,
        origin=np.asarray(app._origin, np.float64),
        ref_lla=np.asarray(app._ref_lla, np.float64),
        gravity=np.asarray(app._gravity, np.float64),
        trust=np.asarray([1.0 if was_denied else 0.0, trust], np.float64),
        cadence_idx=np.asarray(app._cadence._idx),
        **win_arrays,
    )


def load_ligo_tc(path: str, app):
    """Restore a save_ligo_tc checkpoint into a freshly constructed app."""
    import jax.numpy as _jnp

    z = np.load(path)
    n = int(z["n_win"])
    pim_keys = ("dR", "dv", "dp", "dR_dbg", "dv_dba", "dv_dbg", "dp_dba", "dp_dbg",
                "bias_hat", "cov")
    win = []
    for k in range(n):
        pim = None
        if bool(z["win_has_pim"][k]):
            pim = {key: z[f"win_pim_{key}"][k] for key in pim_keys}
            pim["dt"] = float(z["win_pim_dt"][k])
        rel = None
        if bool(z["win_has_rel"][k]):
            rel = (z["win_rel_rot"][k], z["win_rel_trans"][k])
        win.append(
            dict(
                pose=(z["win_rot"][k], z["win_trans"][k]),
                vel=z["win_vel"][k],
                bias=z["win_bias"][k],
                ins=((z["win_ins_rot"][k], z["win_ins_trans"][k]),
                     z["win_ins_sigma"][k]),
                ins_vel=z["win_ins_vel"][k],
                pim=pim,
                rel=rel,
                rel_cov=z["win_rel_cov"][k],
            )
        )
    app._win = win
    app._kf_clouds = _jnp.asarray(z["kf_clouds"])
    app._kf_masks = _jnp.asarray(z["kf_masks"])
    app._kf_head = int(z["kf_head"])
    app._kf_slots = []
    for s in range(z["slot_used"].shape[0]):
        if not bool(z["slot_used"][s]):
            app._kf_slots.append(None)
        elif int(z["slot_win_idx"][s]) >= 0:
            app._kf_slots.append(win[int(z["slot_win_idx"][s])])
        else:
            app._kf_slots.append(
                dict(pose=(z["slot_rot"][s], z["slot_trans"][s]))
            )
    app._origin = z["origin"]
    app._ref_lla = z["ref_lla"]
    app._gravity = z["gravity"]
    app._factor_template = app._factor_template._replace(
        gravity=_jnp.asarray(app._gravity)
    )
    app._trust = (bool(z["trust"][0] > 0.5), float(z["trust"][1]))
    app._cadence._idx = int(z["cadence_idx"])
    app._cadence.force_next = True  # the RegMap cache is not persisted
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
