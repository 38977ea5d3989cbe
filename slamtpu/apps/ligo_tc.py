"""Tightly-coupled LiDAR-IMU-GNSS odometry (the reference ``pipeline_ligo_tc``,
/root/reference/run/pipeline_ligo_tc.cpp — its glue is rotted against current
decoder APIs; the logic here follows its factor-graph structure, which is
authoritative per SURVEY.md).

Per keyframe (:339-622):
1. preintegrate the per-scan INS raw-IMU window (packet-28 accel/gyro) from
   the previous keyframe bias (:429-449)
2. predicted = preintegration forward propagation (:453)
3. CombinedImuFactor chain on (x, v, b) (:459-463)
4. INS pose prior with trust-gain scaling (:465-506)
5. Newton-NDT between-factor against the keyframe-window target cloud,
   initialized from the IMU prediction (:517-542)
6. window re-solve (replaces iSAM2 :578-587); predict next
Initialization places priors on x/v/b incl. WGS84 gravity (:365-404).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.se3 import Pose3
from ..fusion import (
    ImuBias,
    ImuNoise,
    NavState,
    SmootherConfig,
    WindowState,
    empty_factors,
    integrate,
    marginal_covariance,
    predict,
    trust_gain_init,
    trust_gain_update,
)
from ..fusion import smoother
from ..ins.gravity import gravity_wgs84
from ..mapping import gaussian_map
from ..ndt import NewtonConfig
from ..runtime.config import PipelineConfig
from ..runtime.stats import KeyFrameStats, StageTimer, StatsArchive
from .common import (IngestPipeline, TrajectoryEntry, ins_pose_ned, maybe_deskew,
    np_sqrt_info_from_cov, np_sqrt_info_from_sigmas)
from .odom_ndt import _register_step

log = logging.getLogger("slamtpu.ligo_tc")

IMU_WINDOW_CAPACITY = 64  # padded samples per scan interval (50 Hz x ~0.2 s)


@dataclasses.dataclass
class LigoTcApp:
    cfg: PipelineConfig
    window: int = 6

    def __post_init__(self):
        self.ingest = IngestPipeline(self.cfg)
        reg = self.cfg.register
        self.newton_cfg = NewtonConfig(
            resolution=reg.ndt_resolution,
            outlier_ratio=reg.svn_outlier_ratio,
            max_iterations=reg.ndt_max_iterations,
            trans_eps=reg.ndt_transform_epsilon,
        )
        self.noise = ImuNoise.from_imu_config(self.cfg.imu)
        self.trajectory: List[TrajectoryEntry] = []
        self.stats = StatsArchive()
        self.timer = StageTimer()
        self._ref_lla: Optional[np.ndarray] = None
        self._origin = None
        self._gravity = None
        self._prev_cloud = None
        self._trust = trust_gain_init()
        self._win: List[dict] = []  # per-state dicts (numpy): pose, vel, bias, ins, pim
        self._integrate = jax.jit(integrate)
        self._smooth = jax.jit(smoother.optimize, static_argnames=("cfg",))
        # static factor skeleton (indices + fixed whitenings); gravity is set
        # at the first keyframe from the WGS84 model
        W = self.window
        tpl = empty_factors(W, W - 1, W, 1, W - 1, 0)
        tpl = tpl._replace(
            prior_pose=tpl.prior_pose._replace(idx=jnp.arange(W, dtype=jnp.int32)),
            between=tpl.between._replace(
                i=jnp.arange(W - 1, dtype=jnp.int32), j=jnp.arange(1, W, dtype=jnp.int32)
            ),
            prior_vel=tpl.prior_vel._replace(
                idx=jnp.arange(W, dtype=jnp.int32),
                sqrt_info=jnp.broadcast_to(jnp.eye(3) / 0.5, (W, 3, 3)),
            ),
            prior_bias=tpl.prior_bias._replace(
                idx=jnp.asarray([0], jnp.int32),
                sqrt_info=(jnp.eye(6) / 0.05)[None],
                active=jnp.asarray([True]),
            ),
            imu=tpl.imu._replace(
                i=jnp.arange(W - 1, dtype=jnp.int32), j=jnp.arange(1, W, dtype=jnp.int32)
            ),
        )
        self._factor_template = tpl

    def run_replay(self, replay_path: str, max_keyframes: int = 10**9):
        for synced in self.ingest.synced_frames(replay_path):
            self.process(synced)
            if len(self.trajectory) >= max_keyframes:
                break
        return self.trajectory

    def _imu_window(self, synced):
        """Padded (accel, gyro, dts) arrays from the scan's INS samples,
        static biases removed (imu config, compcallback.cpp:28-157)."""
        samples = synced.ins
        acc = np.zeros((IMU_WINDOW_CAPACITY, 3))
        gyr = np.zeros((IMU_WINDOW_CAPACITY, 3))
        dts = np.zeros(IMU_WINDOW_CAPACITY)
        k = 0
        for a, b in zip(samples, samples[1:]):
            if k >= IMU_WINDOW_CAPACITY:
                log.warning("IMU window overflow (%d samples)", len(samples))
                break
            acc[k] = np.asarray(a.imu_accel) - self.cfg.imu.static_bias_accel
            gyr[k] = np.asarray(a.imu_gyro) - self.cfg.imu.static_bias_gyro
            dts[k] = max(b.t - a.t, 0.0)
            k += 1
        return jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts)

    def process(self, synced):
        with self.timer.span("project"):
            scan = self.ingest.project(synced)
        nav = synced.ins[-1]
        if self._ref_lla is None:
            self._ref_lla = np.asarray(nav.lla)
            g_mag = float(gravity_wgs84(*[jnp.asarray(v) for v in nav.lla]))
            self._gravity = jnp.asarray([0.0, 0.0, g_mag])  # NED: g is +down
            self._factor_template = self._factor_template._replace(
                gravity=jnp.asarray(self._gravity, jnp.float64)
            )
        scan = maybe_deskew(scan, synced, self._ref_lla, self.cfg.deskew)
        ins_pose = ins_pose_ned(nav, self._ref_lla)
        ins_sigma = np.concatenate([np.asarray(nav.sigma_rpy), np.asarray(nav.sigma_pos)])
        vel_ned = jnp.asarray(np.asarray(nav.vel_ned))

        if self._prev_cloud is None:
            grid_half = 512.0 * self.newton_cfg.resolution
            self._origin = jnp.asarray(np.asarray(ins_pose.trans) - grid_half, jnp.float32)
            world = se3.transform_points(ins_pose, scan.points)
            self._prev_cloud = (world, scan.mask)
            ins_np = (np.asarray(ins_pose.rot), np.asarray(ins_pose.trans))
            self._win = [
                dict(
                    pose=ins_np, vel=np.asarray(vel_ned), bias=np.zeros(6),
                    ins=(ins_np, np.maximum(ins_sigma, 1e-6)),
                    ins_vel=np.asarray(vel_ned),
                    pim=None, rel=None, rel_cov=None,
                )
            ]
            self.trajectory.append(
                TrajectoryEntry(synced.t_end, synced.scan.frame_id, ins_pose, ins_pose)
            )
            return

        prev = self._win[-1]
        prev_pose = Pose3(jnp.asarray(prev["pose"][0]), jnp.asarray(prev["pose"][1]))
        with self.timer.span("preintegrate"):
            acc, gyr, dts = self._imu_window(synced)
            bias_prev = ImuBias(
                jnp.asarray(prev["bias"][:3]), jnp.asarray(prev["bias"][3:])
            )
            pim = self._integrate(acc, gyr, dts, bias_prev, self.noise)
            predicted = predict(
                NavState(prev_pose, jnp.asarray(prev["vel"])), bias_prev, pim,
                self._gravity,
            )
        self._origin, _shifted = gaussian_map.recenter_origin(
            self._origin, np.asarray(ins_pose.trans), self.newton_cfg.resolution
        )
        with self.timer.span("ndt"):
            res = _register_step(
                self._prev_cloud[0],
                self._prev_cloud[1],
                scan.points,
                scan.mask,
                se3.cast(predicted.pose, jnp.float32),
                self._origin,
                self.newton_cfg,
                self.cfg.register.map_capacity,
                self.cfg.register.min_points_per_voxel,
                tuple(self.cfg.register.reg_grid_shape)
                if self.cfg.register.use_regmap
                else None,
            )
        H = np.asarray(res.hessian, np.float64)
        lidar_cov = -np.linalg.inv(H + 1e-6 * np.eye(6))
        lidar_cov = 0.5 * (lidar_cov + lidar_cov.T)
        ev, evec = np.linalg.eigh(lidar_cov)
        lidar_cov = evec @ np.diag(np.maximum(ev, 1e-12)) @ evec.T
        rel = se3.between(prev_pose, se3.cast(res.pose, prev_pose.trans.dtype))

        self._trust, scale = trust_gain_update(
            self._trust, jnp.asarray(float(np.linalg.norm(np.asarray(nav.sigma_pos))))
        )
        scaled_sigma = np.maximum(ins_sigma * float(scale), 1e-6)

        pim_np = dict(
            dR=np.asarray(pim.dR), dv=np.asarray(pim.dv), dp=np.asarray(pim.dp),
            dt=float(pim.dt), dR_dbg=np.asarray(pim.dR_dbg),
            dv_dba=np.asarray(pim.dv_dba), dv_dbg=np.asarray(pim.dv_dbg),
            dp_dba=np.asarray(pim.dp_dba), dp_dbg=np.asarray(pim.dp_dbg),
            bias_hat=np.asarray(pim.bias_hat.vec()), cov=np.asarray(pim.cov),
        )
        self._win.append(
            dict(
                pose=(np.asarray(res.pose.rot, np.float64), np.asarray(res.pose.trans, np.float64)),
                vel=np.asarray(predicted.vel), bias=np.asarray(prev["bias"]),
                ins=((np.asarray(ins_pose.rot), np.asarray(ins_pose.trans)), scaled_sigma),
                ins_vel=np.asarray(vel_ned),
                pim=pim_np,
                rel=(np.asarray(rel.rot, np.float64), np.asarray(rel.trans, np.float64)),
                rel_cov=lidar_cov,
            )
        )
        if len(self._win) > self.window:
            self._win.pop(0)

        with self.timer.span("smoother"):
            # _fuse writes the optimized states back into self._win
            pose_opt, vel_opt, bias_opt, cov_opt = self._fuse()
        world = se3.transform_points(se3.cast(pose_opt, jnp.float32), scan.points)
        self._prev_cloud = (world, scan.mask)
        self.trajectory.append(
            TrajectoryEntry(
                synced.t_end, synced.scan.frame_id, pose_opt, ins_pose, cov_opt
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
            )
        )

    def _fuse(self):
        """Window re-solve. Factor arrays are assembled in numpy and shipped
        once — per-op eager device dispatch (~2 ms each via the tunnel) used
        to dominate this step."""
        W = self.window
        n = len(self._win)
        pad = W - n
        eye3, eye6, eye15 = np.eye(3), np.eye(6), np.eye(15)

        def stack(items, pad_item, count=pad):
            return np.stack([np.asarray(x, np.float64) for x in items] + [pad_item] * count)

        st = WindowState.identity(W)._replace(
            rot=jnp.asarray(stack((w["pose"][0] for w in self._win), eye3)),
            trans=jnp.asarray(stack((w["pose"][1] for w in self._win), np.zeros(3))),
            vel=jnp.asarray(stack((w["vel"] for w in self._win), np.zeros(3))),
            bias=jnp.asarray(stack((w["bias"] for w in self._win), np.zeros(6))),
            active=jnp.asarray([True] * n + [False] * pad),
        )
        factors = self._factor_template
        fp = factors.prior_pose._replace(
            rot=jnp.asarray(stack((w["ins"][0][0] for w in self._win), eye3)),
            trans=jnp.asarray(stack((w["ins"][0][1] for w in self._win), np.zeros(3))),
            sqrt_info=jnp.asarray(
                stack((np_sqrt_info_from_sigmas(w["ins"][1]) for w in self._win), eye6)
            ),
            active=jnp.asarray([True] * n + [False] * pad),
        )
        fv = factors.prior_vel._replace(
            value=jnp.asarray(stack((w["ins_vel"] for w in self._win), np.zeros(3))),
            active=jnp.asarray([True] * n + [False] * pad),
        )
        fbias = factors.prior_bias._replace(
            value=jnp.asarray(np.asarray(self._win[0]["bias"], np.float64)[None]),
        )
        n_b = n - 1
        pad_b = W - 1 - n_b
        fb = factors.between._replace(
            rot=jnp.asarray(stack((w["rel"][0] for w in self._win[1:]), eye3, pad_b)),
            trans=jnp.asarray(stack((w["rel"][1] for w in self._win[1:]), np.zeros(3), pad_b)),
            sqrt_info=jnp.asarray(
                stack((np_sqrt_info_from_cov(w["rel_cov"]) for w in self._win[1:]), eye6, pad_b)
            ),
            active=jnp.asarray([True] * n_b + [False] * pad_b),
        )
        pims = [w["pim"] for w in self._win[1:]]  # numpy dicts

        def stack_pim(key, pad_val):
            return jnp.asarray(stack((p[key] for p in pims), pad_val, pad_b))

        fi = factors.imu._replace(
            dR=stack_pim("dR", eye3),
            dv=stack_pim("dv", np.zeros(3)),
            dp=stack_pim("dp", np.zeros(3)),
            dt=jnp.asarray(np.asarray([p["dt"] for p in pims] + [0.0] * pad_b)),
            dR_dbg=stack_pim("dR_dbg", np.zeros((3, 3))),
            dv_dba=stack_pim("dv_dba", np.zeros((3, 3))),
            dv_dbg=stack_pim("dv_dbg", np.zeros((3, 3))),
            dp_dba=stack_pim("dp_dba", np.zeros((3, 3))),
            dp_dbg=stack_pim("dp_dbg", np.zeros((3, 3))),
            bias_hat=stack_pim("bias_hat", np.zeros(6)),
            sqrt_info=jnp.asarray(
                stack((np_sqrt_info_from_cov(p["cov"]) for p in pims), eye15, pad_b)
            ),
            active=jnp.asarray([True] * n_b + [False] * pad_b),
        )
        factors = factors._replace(
            prior_pose=fp, between=fb, prior_vel=fv, prior_bias=fbias, imu=fi,
        )
        result = self._smooth(st, factors, SmootherConfig(iterations=6))
        state_rot = np.asarray(result.state.rot)
        state_trans = np.asarray(result.state.trans)
        state_vel = np.asarray(result.state.vel)
        state_bias = np.asarray(result.state.bias)
        cur = n - 1
        pose = Pose3(jnp.asarray(state_rot[cur]), jnp.asarray(state_trans[cur]))
        cov = np.asarray(marginal_covariance(result.hessian, cur))
        for k in range(n):
            self._win[k]["pose"] = (state_rot[k], state_trans[k])
            self._win[k]["vel"] = state_vel[k]
            self._win[k]["bias"] = state_bias[k]
        return pose, state_vel[cur], state_bias[cur], cov
