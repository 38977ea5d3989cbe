"""Newton-NDT odometry + window-smoother fusion (the reference ``pipeline``
executable, /root/reference/run/pipeline.cpp).

Per keyframe (pipeline.cpp:432-824):
1. target map = previous keyframe cloud at its optimized pose (:552-557)
2. Newton NDT from the constant-velocity initial guess (:558-563)
3. deviation gate vs the constant-velocity prediction -> SE(3) blend
   (:570-592)
4. LiDAR between-factor with covariance -(H + 1e-6 I)^-1 (:594-604)
5. INS pose prior with GPS-denial trust-gain sigma scaling (:637-665)
6. window smoother re-solve (replaces iSAM2 :738-759), marginal covariance
7. constant-velocity prediction of the next initial guess (:763-770)
"""
from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.se3 import Pose3
from ..fusion import (
    SmootherConfig,
    WindowState,
    empty_factors,
    marginal_covariance,
    trust_gain_init,
    trust_gain_update,
)
from ..fusion import robust, smoother
from ..mapping import gaussian_map
from ..ndt import NewtonConfig, newton_align
from ..runtime.config import PipelineConfig
from ..runtime.stats import KeyFrameStats, StageTimer, StatsArchive
from .common import (IngestPipeline, TrajectoryEntry, ins_pose_ned, maybe_deskew,
    np_sqrt_info_from_cov, np_sqrt_info_from_sigmas)

log = logging.getLogger("slamtpu.odom_ndt")


@partial(
    jax.jit, static_argnames=("cfg", "capacity", "min_points", "grid_shape")
)
def _register_step(
    target_points,  # (N, 3) previous keyframe cloud, world frame
    target_mask,
    new_points,  # (N, 3) body frame
    new_mask,
    init_guess: Pose3,
    origin,
    cfg: NewtonConfig,
    capacity: int,
    min_points: int,
    grid_shape: tuple = None,
):
    gmap = gaussian_map.build_map(
        target_points, target_mask, origin, cfg.resolution,
        capacity=capacity, min_points_per_voxel=min_points,
    )
    if grid_shape is None:
        return newton_align(new_points, new_mask, gmap, init_guess, cfg)
    from ..ndt import build_regmap, newton_align_reg
    from ..ndt.pallas_math import BLOCK, newton_align_fused

    regmap = build_regmap(gmap, grid_shape=grid_shape)
    # fused Pallas path on real TPU (interpret mode on CPU would dominate
    # test runtimes; the XLA path is numerically equivalent)
    if (
        jax.default_backend() == "tpu"
        and new_points.dtype == jnp.float32
        and new_points.shape[0] % BLOCK == 0
    ):
        return newton_align_fused(
            new_points, new_mask, regmap, init_guess, cfg, grid_shape, inner_iters=4
        )
    return newton_align_reg(new_points, new_mask, regmap, init_guess, cfg, grid_shape)


@dataclasses.dataclass
class OdomNdtApp:
    cfg: PipelineConfig
    window: int = 8  # smoother window size (states kept live)
    max_trans_deviation: float = 1.0  # pipeline.cpp:454
    max_rot_deviation: float = 0.1  # pipeline.cpp:455

    def __post_init__(self):
        self.ingest = IngestPipeline(self.cfg)
        reg = self.cfg.register
        self.newton_cfg = NewtonConfig(
            resolution=reg.ndt_resolution,
            outlier_ratio=reg.svn_outlier_ratio,
            max_iterations=reg.ndt_max_iterations,
            trans_eps=reg.ndt_transform_epsilon,
            use_direct1=reg.search_method == "DIRECT1",
        )
        self.trajectory: List[TrajectoryEntry] = []
        self.stats = StatsArchive()
        self.timer = StageTimer()
        self._ref_lla: Optional[np.ndarray] = None
        self._origin = None
        self._prev_cloud = None  # (points_world, mask) of previous keyframe
        self._prev_pose: Optional[Pose3] = None
        self._prev_prev_pose: Optional[Pose3] = None
        self._trust = trust_gain_init()
        # smoother ring: window poses; index of current within window
        self._win_poses: List = []  # (rot np, trans np) per state
        self._win_ins: List = []  # ((rot, trans), scaled_sigmas) per state
        self._win_between: List = []  # ((rot, trans), cov 6x6) between i-1 -> i
        self._smooth = jax.jit(
            smoother.optimize, static_argnames=("cfg",)
        )
        # static factor skeleton: indices and the vel/bias pins never change
        W = self.window
        tpl = empty_factors(W, W - 1, 1, 1, 0, 0)
        tpl = tpl._replace(
            prior_pose=tpl.prior_pose._replace(idx=jnp.arange(W, dtype=jnp.int32)),
            between=tpl.between._replace(
                i=jnp.arange(W - 1, dtype=jnp.int32),
                j=jnp.arange(1, W, dtype=jnp.int32),
            ),
            prior_vel=tpl.prior_vel._replace(
                idx=jnp.asarray([0], jnp.int32), active=jnp.asarray([True])
            ),
            prior_bias=tpl.prior_bias._replace(
                idx=jnp.asarray([0], jnp.int32), active=jnp.asarray([True])
            ),
        )
        self._factor_template = tpl

    def run_replay(self, replay_path: str, max_keyframes: int = 10**9):
        for synced in self.ingest.synced_frames(replay_path):
            self.process(synced)
            if len(self.trajectory) >= max_keyframes:
                break
        return self.trajectory

    def process(self, synced):
        with self.timer.span("project"):
            scan = self.ingest.project(synced)
        nav = synced.ins[-1]
        if self._ref_lla is None:
            self._ref_lla = np.asarray(nav.lla)
        scan = maybe_deskew(scan, synced, self._ref_lla, self.cfg.deskew)
        ins_pose = ins_pose_ned(nav, self._ref_lla)
        ins_sigma = np.concatenate([np.asarray(nav.sigma_rpy), np.asarray(nav.sigma_pos)])

        if self._prev_cloud is None:
            # first keyframe: INS prior only (pipeline.cpp:532-543)
            grid_half = 512.0 * self.newton_cfg.resolution
            self._origin = jnp.asarray(np.asarray(ins_pose.trans) - grid_half, jnp.float32)
            self._start(ins_pose, ins_sigma, synced, scan)
            return

        # constant-velocity initial guess (pipeline.cpp:763-770)
        if self._prev_prev_pose is not None:
            guess = robust.constant_velocity_predict(self._prev_prev_pose, self._prev_pose)
        else:
            guess = self._prev_pose
        guess = se3.cast(guess, jnp.float32)  # NDT path runs f32

        self._origin, _shifted = gaussian_map.recenter_origin(
            self._origin, np.asarray(ins_pose.trans), self.newton_cfg.resolution
        )
        with self.timer.span("ndt"):
            res = _register_step(
                self._prev_cloud[0],
                self._prev_cloud[1],
                scan.points,
                scan.mask,
                guess,
                self._origin,
                self.newton_cfg,
                self.cfg.register.map_capacity,
                self.cfg.register.min_points_per_voxel,
                tuple(self.cfg.register.reg_grid_shape)
                if self.cfg.register.use_regmap
                else None,
            )
        # deviation gate + blend (pipeline.cpp:570-592)
        blended, w = robust.deviation_gated_blend(
            guess, res.pose, self.max_trans_deviation, self.max_rot_deviation
        )
        # LiDAR covariance from the Hessian (pipeline.cpp:594-603)
        H = np.asarray(res.hessian, np.float64)
        lidar_cov = -np.linalg.inv(H + 1e-6 * np.eye(6))
        lidar_cov = 0.5 * (lidar_cov + lidar_cov.T)
        ev, evec = np.linalg.eigh(lidar_cov)
        lidar_cov = evec @ np.diag(np.maximum(ev, 1e-12)) @ evec.T
        rel = se3.between(self._prev_pose, blended)

        # trust-gain INS prior (pipeline.cpp:637-665); insChecker = sigma norm
        self._trust, scale = trust_gain_update(
            self._trust, jnp.asarray(float(np.linalg.norm(np.asarray(nav.sigma_pos))))
        )
        scaled_sigma = ins_sigma * float(scale)
        scaled_sigma = np.maximum(scaled_sigma, 1e-6)

        with self.timer.span("smoother"):
            pose_opt, cov_opt = self._fuse(blended, rel, lidar_cov, ins_pose, scaled_sigma)

        self._prev_prev_pose = self._prev_pose
        self._prev_pose = pose_opt
        world = se3.transform_points(se3.cast(pose_opt, jnp.float32), scan.points)
        self._prev_cloud = (world, scan.mask)
        self.trajectory.append(
            TrajectoryEntry(
                timestamp=synced.t_end,
                frame_id=synced.scan.frame_id,
                pose=pose_opt,
                ins_pose=ins_pose,
                covariance=cov_opt,
            )
        )
        self.stats.add(
            KeyFrameStats(
                frame_id=synced.scan.frame_id,
                timestamp=synced.t_end,
                num_points=int(scan.num_points),
                ndt_iterations=int(res.iterations),
                converged=bool(res.converged),
                score=float(res.score),
                ins_sigma=ins_sigma,
                scaled_sigma=scaled_sigma,
                lidar_sigma=np.sqrt(np.maximum(np.diag(lidar_cov), 0.0)),
                optimized_sigma=np.sqrt(np.maximum(np.diag(cov_opt)[:6], 0.0))
                if cov_opt is not None
                else np.zeros(6),
                trust_weight=float(w),
            )
        )

    def _start(self, ins_pose, ins_sigma, synced, scan):
        self._prev_pose = ins_pose
        world = se3.transform_points(ins_pose, scan.points)
        self._prev_cloud = (world, scan.mask)
        self._win_poses = [(np.asarray(ins_pose.rot), np.asarray(ins_pose.trans))]
        self._win_ins = [
            ((np.asarray(ins_pose.rot), np.asarray(ins_pose.trans)),
             np.maximum(ins_sigma, 1e-6))
        ]
        self._win_between = []
        self.trajectory.append(
            TrajectoryEntry(
                timestamp=synced.t_end,
                frame_id=synced.scan.frame_id,
                pose=ins_pose,
                ins_pose=ins_pose,
            )
        )

    def _fuse(self, blended_pose, rel, lidar_cov, ins_pose, scaled_sigma):
        """Window smoother: INS priors on every state + NDT betweens.

        All factor arrays are assembled in numpy and shipped to the device in
        a handful of transfers — per-op eager dispatch costs ~2 ms through
        the device tunnel, which dominated this step when every stack/eye ran
        on device."""
        np_pose = lambda p: (np.asarray(p.rot, np.float64), np.asarray(p.trans, np.float64))
        self._win_poses.append(np_pose(blended_pose))
        self._win_ins.append((np_pose(ins_pose), np.asarray(scaled_sigma)))
        self._win_between.append((np_pose(rel), np.asarray(lidar_cov)))
        if len(self._win_poses) > self.window:
            self._win_poses.pop(0)
            self._win_ins.pop(0)
            self._win_between.pop(0)
        W = self.window
        n = len(self._win_poses)
        pad = W - n

        def stack(items, pad_item, count):
            return np.stack(list(items) + [pad_item] * count)

        eye3, eye6 = np.eye(3), np.eye(6)
        st = WindowState.identity(W)._replace(
            rot=jnp.asarray(stack((r for r, _ in self._win_poses), eye3, pad)),
            trans=jnp.asarray(stack((t for _, t in self._win_poses), np.zeros(3), pad)),
            active=jnp.asarray([True] * n + [False] * pad),
        )
        factors = self._factor_template
        fp = factors.prior_pose._replace(
            rot=jnp.asarray(stack((p[0] for p, _ in self._win_ins), eye3, pad)),
            trans=jnp.asarray(stack((p[1] for p, _ in self._win_ins), np.zeros(3), pad)),
            sqrt_info=jnp.asarray(
                stack((np_sqrt_info_from_sigmas(s) for _, s in self._win_ins), eye6, pad)
            ),
            active=jnp.asarray([True] * n + [False] * pad),
        )
        n_b = len(self._win_between)  # always n - 1: between k -> k+1
        fb = factors.between._replace(
            rot=jnp.asarray(stack((r[0] for r, _ in self._win_between), eye3, W - 1 - n_b)),
            trans=jnp.asarray(stack((r[1] for r, _ in self._win_between), np.zeros(3), W - 1 - n_b)),
            sqrt_info=jnp.asarray(
                stack((np_sqrt_info_from_cov(c) for _, c in self._win_between), eye6, W - 1 - n_b)
            ),
            active=jnp.asarray([True] * n_b + [False] * (W - 1 - n_b)),
        )
        factors = factors._replace(prior_pose=fp, between=fb)
        result = self._smooth(st, factors, SmootherConfig(iterations=5))
        state_rot = np.asarray(result.state.rot)
        state_trans = np.asarray(result.state.trans)
        cur = n - 1
        pose_opt = Pose3(jnp.asarray(state_rot[cur]), jnp.asarray(state_trans[cur]))
        cov = np.asarray(marginal_covariance(result.hessian, cur))
        # write back optimized window poses (host copies)
        self._win_poses = [(state_rot[k], state_trans[k]) for k in range(n)]
        return pose_opt, cov
