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
)
from ..fusion import robust, smoother
from ..mapping import gaussian_map
from ..ndt import NewtonConfig, newton_align
from ..runtime.config import PipelineConfig
from ..runtime.stats import KeyFrameStats, StageTimer, StatsArchive
from .common import (IngestPipeline, TrajectoryEntry, ins_pose_ned, maybe_deskew,
    np_between, np_pose7 as _p7, np_sqrt_info_from_cov, np_sqrt_info_from_sigmas)
from .packed import PackedStep

log = logging.getLogger("slamtpu.odom_ndt")


def _use_fused(new_points):
    """Fused Pallas path on real TPU (interpret mode on CPU would dominate
    test runtimes; the XLA path is numerically equivalent)."""
    from ..ndt.pallas_math import BLOCK

    return (
        jax.default_backend() == "tpu"
        and new_points.dtype == jnp.float32
        and new_points.shape[0] % BLOCK == 0
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "capacity", "min_points", "grid_shape", "method", "svn_cfg",
        "inner_iters",
    ),
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
    reg_pose: Pose3 = None,
    method: str = "NDT_OMP",
    svn_cfg=None,  # ndt.SvnConfig, required for method == "SVNNDT"
    key=None,  # PRNG key, required for method == "SVNNDT"
    regmap_cache=None,  # RegMap: enables reduced-cadence rebuild (NDT_OMP only)
    rebuild=None,  # () bool: rebuild the map this call (with regmap_cache)
    inner_iters: int = 2,  # fused-kernel Newton steps per gather
):
    """Build the target map and register by the configured engine — the
    analog of the reference's registration_method switch
    (/root/reference/run/pipeline.cpp:464-481, src/registercallback.cpp:41-61):
    NDT_OMP -> Newton P2D-NDT, SVNNDT -> SVN particle flow (posterior mean),
    GICP -> voxelized GICP, NDT_OMP_MULTIRES -> coarse-to-fine pyramid.

    With ``regmap_cache``/``rebuild`` (NDT_OMP + grid_shape only) the
    map+RegMap build — the dominant keyframe cost — runs under ``lax.cond``
    and the call returns ``(result, regmap)`` so the caller can carry the
    cache forward (cf. RegisterConfig.map_rebuild_every)."""
    if method == "NDT_OMP_MULTIRES":
        from ..ndt.multires import build_pyramid, multires_align

        levels = build_pyramid(
            target_points, target_mask, origin,
            resolutions=[2.0 * cfg.resolution, cfg.resolution],
            capacity=capacity,
            grid_shape=grid_shape or (256, 256, 64),
            min_points_per_voxel=min_points,
            max_iterations=[max(cfg.max_iterations // 3, 3), cfg.max_iterations],
        )
        return multires_align(new_points, new_mask, levels, init_guess)

    def build_gmap():
        return gaussian_map.build_map(
            target_points, target_mask, origin, cfg.resolution,
            capacity=capacity, min_points_per_voxel=min_points,
        )

    if method == "GICP":
        gmap = build_gmap()
        from ..ndt import build_regmap, gicp_align, gicp_align_fused, gicp_map

        regmap = build_regmap(gicp_map(gmap), grid_shape=grid_shape or (256, 256, 64))
        if _use_fused(new_points) and grid_shape is not None:
            return gicp_align_fused(
                new_points, new_mask, regmap, init_guess, cfg,
                grid_shape, inner_iters=inner_iters,
            )
        return gicp_align(
            new_points, new_mask, regmap, init_guess, cfg, grid_shape or (256, 256, 64)
        )
    if method == "SVNNDT":
        from ..ndt import NewtonResult, build_regmap, svn_align, svn_align_reg

        gmap = build_gmap()
        if grid_shape is None:
            res = svn_align(new_points, new_mask, gmap, init_guess, key, svn_cfg)
        else:
            regmap = build_regmap(gmap, grid_shape=grid_shape)
            res = svn_align_reg(
                new_points, new_mask, regmap, init_guess, key, svn_cfg, grid_shape
            )
        # adapt the posterior to the Newton interface: H = -cov^-1 so that
        # the apps' lidar_cov = -(H)^-1 recovers the SVN posterior covariance
        hess = -jnp.linalg.inv(
            res.covariance + 1e-9 * jnp.eye(6, dtype=res.covariance.dtype)
        )
        return NewtonResult(
            pose=res.pose,
            hessian=hess,
            score=jnp.zeros((), new_points.dtype),
            iterations=res.iterations,
            converged=res.converged,
            n_contrib=jnp.zeros((), jnp.int32),
        )

    if grid_shape is None:
        return newton_align(
            new_points, new_mask, build_gmap(), init_guess, cfg, reg_pose=reg_pose
        )
    from ..ndt import build_regmap, newton_align_reg
    from ..ndt.pallas_math import newton_align_fused

    if regmap_cache is None:
        regmap = build_regmap(build_gmap(), grid_shape=grid_shape)
    else:
        # the whole map+RegMap build traces inside the cond branch: it only
        # EXECUTES on rebuild keyframes
        def do_build(_):
            rm = build_regmap(build_gmap(), grid_shape=grid_shape)
            return jax.tree.map(lambda a, e: a.astype(e.dtype), rm, regmap_cache)

        regmap = jax.lax.cond(rebuild, do_build, lambda _: regmap_cache, None)
    if _use_fused(new_points):
        res = newton_align_fused(
            new_points, new_mask, regmap, init_guess, cfg, grid_shape,
            inner_iters=inner_iters, reg_pose=reg_pose,
        )
    else:
        res = newton_align_reg(
            new_points, new_mask, regmap, init_guess, cfg, grid_shape, reg_pose=reg_pose
        )
    return res if regmap_cache is None else (res, regmap)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "capacity", "min_points", "grid_shape", "max_td", "max_rd",
        "method", "svn_cfg", "inner_iters",
    ),
)
def _odom_step(
    prev_points,  # (N, 3) previous keyframe cloud, BODY frame
    prev_mask,
    new_points,  # (N, 3) body frame
    new_mask,
    flat,  # (28,) [prev_opt_pose(12), prev_prev_pose(12), have_pp(1), origin(3)]
    cfg: NewtonConfig,
    capacity: int,
    min_points: int,
    grid_shape: tuple,
    max_td: float,
    max_rd: float,
    method: str = "NDT_OMP",
    svn_cfg=None,
    key=None,
    inner_iters: int = 2,
):
    """One fully-fused odometry keyframe (pipeline.cpp:432-592): transform
    the target cloud to its optimized world pose, build the NDT map,
    register from the constant-velocity guess, deviation-gate + blend.

    All small inputs ride in a single packed vector and the result comes
    back as one (52,) vector [blended(12), hessian(36), score, iterations,
    converged, w] — per-array transfers cost ~6 ms each via the TPU tunnel
    and used to dominate keyframe time."""
    f32 = jnp.float32
    prev = Pose3(flat[0:9].reshape(3, 3).astype(f32), flat[9:12].astype(f32))
    pp = Pose3(flat[12:21].reshape(3, 3).astype(f32), flat[21:24].astype(f32))
    have_pp = flat[24] > 0.5
    origin = flat[25:28].astype(f32)
    target = se3.transform_points(prev, prev_points)
    guess_cv = robust.constant_velocity_predict(pp, prev)
    guess = jax.tree.map(
        lambda a, b: jnp.where(have_pp, a, b), guess_cv, prev
    )
    res = _register_step(
        target, prev_mask, new_points, new_mask, guess, origin,
        cfg, capacity, min_points, grid_shape,
        method=method, svn_cfg=svn_cfg, key=key, inner_iters=inner_iters,
    )
    blended, w = robust.deviation_gated_blend(guess, res.pose, max_td, max_rd)
    return jnp.concatenate(
        [
            blended.rot.ravel().astype(f32),
            blended.trans.astype(f32),
            res.hessian.ravel().astype(f32),
            jnp.stack(
                [
                    res.score.astype(f32),
                    res.iterations.astype(f32),
                    res.converged.astype(f32),
                    w.astype(f32),
                ]
            ),
        ]
    )


@dataclasses.dataclass
class OdomNdtApp:
    cfg: PipelineConfig
    window: int = 8  # smoother window size (states kept live)
    max_trans_deviation: float = 1.0  # pipeline.cpp:454
    max_rot_deviation: float = 0.1  # pipeline.cpp:455
    loop_closure: bool = False  # voxel-bucket candidate search + NDT verify
    loop_cfg: object = None  # fusion.loop_closure.LoopClosureConfig
    method: Optional[str] = None  # None -> cfg.register.method

    def __post_init__(self):
        self.ingest = IngestPipeline(self.cfg)
        reg = self.cfg.register
        # engine choice from the config, as the reference's
        # registration_method switch (run/pipeline.cpp:464-481;
        # src/registercallback.cpp:41-43)
        known = ("NDT_OMP", "SVNNDT", "GICP", "NDT_OMP_MULTIRES")
        if self.method is None:
            self.method = reg.method
        if self.method not in known:
            raise ValueError(f"unknown registration method {self.method!r}; known: {known}")
        self.newton_cfg = NewtonConfig(
            resolution=reg.ndt_resolution,
            outlier_ratio=reg.svn_outlier_ratio,
            max_iterations=reg.ndt_max_iterations,
            trans_eps=reg.gicp_transform_epsilon
            if self.method == "GICP"
            else reg.ndt_transform_epsilon,
            use_direct1=reg.search_method == "DIRECT1",
            gicp_max_corr_dist=reg.gicp_corr_dist_threshold,
        )
        self.svn_cfg = None
        self._key = None
        if self.method == "SVNNDT":
            from ..ndt import SvnConfig

            self.svn_cfg = SvnConfig(
                resolution=reg.svn_resolution,
                outlier_ratio=reg.svn_outlier_ratio,
                num_particles=reg.svn_particles,
                max_iterations=reg.svn_max_iterations,
                kernel_h=reg.svn_kernel_h,
                step_size=reg.svn_step_size,
                stop_thresh=reg.svn_stop_thresh,
                use_direct1=reg.svn_search_method == "DIRECT1",
            )
            self._key = jax.random.PRNGKey(1234)
        self.trajectory: List[TrajectoryEntry] = []
        self.stats = StatsArchive()
        self.timer = StageTimer()
        self._ref_lla: Optional[np.ndarray] = None
        self._origin = None  # numpy (3,)
        self._prev_cloud = None  # (points_body, mask) of previous keyframe (device)
        self._prev_pose = None  # (rot, trans) numpy, optimized world pose
        self._prev_prev_pose = None
        self._trust = robust.trust_gain_init_np()
        # smoother ring: window poses; index of current within window
        self._win_poses: List = []  # (rot np, trans np) per state
        self._win_ins: List = []  # ((rot, trans), scaled_sigmas) per state
        self._win_between: List = []  # ((rot, trans), cov 6x6) between i-1 -> i
        self._fuse_step = PackedStep(self._fuse_device)
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
        # loop closure (the reference's candidate-search scaffold,
        # pipeline.cpp:676-736, completed): detector + full odometry-chain
        # history for the offline pose-graph refinement pass
        self._detector = None
        self._closures = []
        self._odo_rels = []  # (rel (rot, trans) numpy, cov 6x6) per step
        if self.loop_closure:
            from ..fusion.loop_closure import LoopClosureConfig, LoopDetector

            self._detector = LoopDetector(self.loop_cfg or LoopClosureConfig())

    def run_replay(self, replay_path: str, max_keyframes: int = 10**9):
        for synced in self.ingest.synced_frames(replay_path):
            self.process(synced)
            if len(self.trajectory) >= max_keyframes:
                break
        return self.trajectory

    def _next_key(self):
        """Fresh PRNG key per keyframe (SVNNDT engine only)."""
        if self._key is None:
            return None
        self._key, sub = jax.random.split(self._key)
        return sub

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
            self._origin = np.asarray(ins_pose.trans, np.float64) - grid_half
            self._start(ins_pose, ins_sigma, synced, scan)
            return

        self._origin, _shifted = gaussian_map.recenter_origin(
            self._origin, np.asarray(ins_pose.trans), self.newton_cfg.resolution
        )
        # pack the guess poses + origin; run register+gate+blend as ONE
        # device step (pipeline.cpp:432-592)
        prev = self._prev_pose
        pp = self._prev_prev_pose if self._prev_prev_pose is not None else prev
        flat = np.concatenate(
            [
                np.asarray(prev[0], np.float64).ravel(), np.asarray(prev[1], np.float64),
                np.asarray(pp[0], np.float64).ravel(), np.asarray(pp[1], np.float64),
                [1.0 if self._prev_prev_pose is not None else 0.0],
                np.asarray(self._origin, np.float64),
            ]
        ).astype(np.float32)
        with self.timer.span("ndt"):
            out = np.asarray(
                _odom_step(
                    self._prev_cloud[0],
                    self._prev_cloud[1],
                    scan.points,
                    scan.mask,
                    flat,
                    self.newton_cfg,
                    self.cfg.register.map_capacity,
                    self.cfg.register.min_points_per_voxel,
                    tuple(self.cfg.register.reg_grid_shape)
                    if self.cfg.register.use_regmap
                    else None,
                    self.max_trans_deviation,
                    self.max_rot_deviation,
                    method=self.method,
                    svn_cfg=self.svn_cfg,
                    key=self._next_key(),
                    inner_iters=self.cfg.register.fused_inner_iters,
                ),
                np.float64,
            )
        blended = (out[0:9].reshape(3, 3), out[9:12])
        H = out[12:48].reshape(6, 6)
        ndt_score, ndt_iters, ndt_converged, w = out[48:52]
        # LiDAR covariance from the Hessian (pipeline.cpp:594-603)
        lidar_cov = -np.linalg.inv(H + 1e-6 * np.eye(6))
        lidar_cov = 0.5 * (lidar_cov + lidar_cov.T)
        ev, evec = np.linalg.eigh(lidar_cov)
        lidar_cov = evec @ np.diag(np.maximum(ev, 1e-12)) @ evec.T
        rel = np_between(self._prev_pose, blended)

        # trust-gain INS prior (pipeline.cpp:637-665); insChecker = sigma norm
        self._trust, scale = robust.trust_gain_update_np(
            self._trust, float(np.linalg.norm(np.asarray(nav.sigma_pos)))
        )
        scaled_sigma = ins_sigma * float(scale)
        scaled_sigma = np.maximum(scaled_sigma, 1e-6)

        with self.timer.span("smoother"):
            pose_opt, cov_opt = self._fuse(blended, rel, lidar_cov, ins_pose, scaled_sigma)

        self._prev_prev_pose = self._prev_pose
        self._prev_pose = pose_opt
        self._prev_cloud = (scan.points, scan.mask)  # body frame; _odom_step transforms
        if self._detector is not None:
            self._odo_rels.append((rel, lidar_cov))
            self._closures += self._detector.add_keyframe(
                Pose3(pose_opt[0], pose_opt[1]), scan.points, scan.mask
            )
        self.trajectory.append(
            TrajectoryEntry(
                timestamp=synced.t_end,
                frame_id=synced.scan.frame_id,
                pose=Pose3(pose_opt[0], pose_opt[1]),
                ins_pose=ins_pose,
                covariance=cov_opt,
            )
        )
        self.stats.add(
            KeyFrameStats(
                frame_id=synced.scan.frame_id,
                timestamp=synced.t_end,
                num_points=int(scan.num_points),
                ndt_iterations=int(ndt_iters),
                converged=bool(ndt_converged > 0.5),
                score=float(ndt_score),
                ins_sigma=ins_sigma,
                scaled_sigma=scaled_sigma,
                lidar_sigma=np.sqrt(np.maximum(np.diag(lidar_cov), 0.0)),
                optimized_sigma=np.sqrt(np.maximum(np.diag(cov_opt)[:6], 0.0))
                if cov_opt is not None
                else np.zeros(6),
                align_time_ms=self.timer.last_ms("ndt"),
                ins_pose=_p7(np.asarray(ins_pose.rot), np.asarray(ins_pose.trans)),
                optimized_pose=_p7(pose_opt[0], pose_opt[1]),
                # INS-vs-optimized translation gap (pipeline.cpp:745-752)
                pose_rmse=float(
                    np.linalg.norm(np.asarray(ins_pose.trans) - np.asarray(pose_opt[1]))
                ),
                trust_weight=float(w),
            )
        )

    def _start(self, ins_pose, ins_sigma, synced, scan):
        self._prev_pose = (np.asarray(ins_pose.rot, np.float64),
                           np.asarray(ins_pose.trans, np.float64))
        self._prev_cloud = (scan.points, scan.mask)  # body frame
        if self._detector is not None:
            self._closures += self._detector.add_keyframe(
                Pose3(self._prev_pose[0], self._prev_pose[1]), scan.points, scan.mask
            )
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

    def _fuse_device(self, a):
        """Device half of the window re-solve (traced once by PackedStep)."""
        W = self.window
        dtype = a["trans"].dtype
        tpl = self._factor_template
        st = WindowState(
            rot=a["rot"], trans=a["trans"],
            vel=jnp.zeros((W, 3), dtype), bias=jnp.zeros((W, 6), dtype),
            active=a["active"],
        )
        factors = tpl._replace(
            prior_pose=tpl.prior_pose._replace(
                rot=a["fp_rot"], trans=a["fp_trans"],
                sqrt_info=a["fp_si"], active=a["active"],
            ),
            between=tpl.between._replace(
                rot=a["fb_rot"], trans=a["fb_trans"],
                sqrt_info=a["fb_si"], active=a["b_active"],
            ),
        )
        result = smoother.optimize(st, factors, SmootherConfig(iterations=5))
        cov = marginal_covariance(result.hessian, a["cur"])
        return dict(rot=result.state.rot, trans=result.state.trans, cov=cov)

    def _fuse(self, blended, rel, lidar_cov, ins_pose, scaled_sigma):
        """Window smoother: INS priors on every state + NDT betweens
        (pipeline.cpp:738-759). Everything is assembled host-side in numpy
        and shipped as ONE packed vector (PackedStep) — per-array transfers
        cost ~6 ms each through the device tunnel."""
        np_pose = lambda p: (np.asarray(p[0], np.float64), np.asarray(p[1], np.float64))
        self._win_poses.append(np_pose(blended))
        self._win_ins.append(
            ((np.asarray(ins_pose.rot, np.float64), np.asarray(ins_pose.trans, np.float64)),
             np.asarray(scaled_sigma))
        )
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
        n_b = len(self._win_between)  # always n - 1: between k -> k+1
        args = dict(
            rot=stack((r for r, _ in self._win_poses), eye3, pad),
            trans=stack((t for _, t in self._win_poses), np.zeros(3), pad),
            active=np.asarray([True] * n + [False] * pad),
            fp_rot=stack((p[0] for p, _ in self._win_ins), eye3, pad),
            fp_trans=stack((p[1] for p, _ in self._win_ins), np.zeros(3), pad),
            fp_si=stack((np_sqrt_info_from_sigmas(s) for _, s in self._win_ins), eye6, pad),
            fb_rot=stack((r[0] for r, _ in self._win_between), eye3, W - 1 - n_b),
            fb_trans=stack((r[1] for r, _ in self._win_between), np.zeros(3), W - 1 - n_b),
            fb_si=stack((np_sqrt_info_from_cov(c) for _, c in self._win_between), eye6, W - 1 - n_b),
            b_active=np.asarray([True] * n_b + [False] * (W - 1 - n_b)),
            cur=np.int32(n - 1),
        )
        out = self._fuse_step(args)
        state_rot = np.asarray(out["rot"], np.float64)
        state_trans = np.asarray(out["trans"], np.float64)
        cov = np.asarray(out["cov"], np.float64)
        # write back optimized window poses (host copies)
        self._win_poses = [(state_rot[k], state_trans[k]) for k in range(n)]
        return (state_rot[n - 1], state_trans[n - 1]), cov

    def refine_loop_closures(self):
        """Offline pose-graph pass over the full trajectory: odometry-chain
        between factors (the per-keyframe NDT relatives and covariances) plus
        every verified loop closure (pipeline.cpp:676-736 completed with
        fusion.pose_graph). Rewrites self.trajectory poses in place and
        returns (refined_poses, closures)."""
        if self._detector is None:
            raise RuntimeError("construct the app with loop_closure=True")
        from ..fusion.loop_closure import refine_trajectory

        poses = [
            Pose3(jnp.asarray(e.pose.rot), jnp.asarray(e.pose.trans))
            for e in self.trajectory
        ]
        rels = [Pose3(jnp.asarray(r[0]), jnp.asarray(r[1])) for r, _ in self._odo_rels]
        covs = [c for _, c in self._odo_rels]
        if not self._closures:
            log.info("no loop closures found; trajectory unchanged")
            return poses, []
        # INS priors (trust-gain-scaled, like the live graph's) keep the
        # offline re-solve anchored to the GNSS information
        prior_poses = [
            Pose3(jnp.asarray(e.ins_pose.rot), jnp.asarray(e.ins_pose.trans))
            for e in self.trajectory
        ]
        prior_sigmas = []
        for k, rec in enumerate(self.stats.records[: len(self.trajectory)]):
            sig = np.asarray(rec.scaled_sigma)
            if not (sig > 0).all():
                sig = np.maximum(np.asarray(rec.ins_sigma), 1e-6)
            prior_sigmas.append(np.maximum(sig, 1e-6))
        while len(prior_sigmas) < len(self.trajectory):
            prior_sigmas.append(np.full(6, 1e-2))
        refined, _result = refine_trajectory(
            poses, rels, covs, self._closures,
            prior_poses=prior_poses, prior_sigmas=prior_sigmas,
        )
        for e, p in zip(self.trajectory, refined):
            e.pose = Pose3(np.asarray(p.rot, np.float64), np.asarray(p.trans, np.float64))
        return refined, self._closures
