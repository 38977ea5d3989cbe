"""Command-line entry: run any app on a replay file.

    python -m slamtpu lo_svn --replay run.rpl --out out/
    python -m slamtpu odom_ndt --replay run.rpl --meta meta.json \
        --lidar lidar.json --imu imu.json --register register.json

Unlike the reference (config paths and UDP endpoints hardcoded per main(),
SURVEY.md section 5.6), everything is a flag; without config files the Berlin
preset with synthetic OS-2-128 metadata is used.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys


def _viz_hold(viewer, hold_s: float) -> None:
    """Keep serving the viewer after the replay finishes.

    0 returns immediately (the daemon server dies with the process);
    positive sleeps that many seconds; negative blocks until Ctrl-C —
    the analogue of the reference's viewer thread join on shutdown
    (run/pipeline.cpp:975-985).
    """
    import time

    if hold_s == 0:
        return
    print(f"replay done — viewer still serving at {viewer.url}"
          + ("" if hold_s > 0 else " (Ctrl-C to exit)"))
    try:
        if hold_s > 0:
            time.sleep(hold_s)
        else:
            viewer.wait_forever()
    except KeyboardInterrupt:
        pass


def main(argv=None):
    from .runtime.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(prog="slamtpu")
    p.add_argument(
        "app",
        choices=["lo_svn", "odom_ndt", "ligo_tc", "ins_map", "calib_compass", "viz_lidar"],
    )
    p.add_argument("--replay", required=True, help="replay file (runtime.replay format)")
    p.add_argument("--out", default="out", help="output directory")
    p.add_argument("--meta", help="Ouster metadata JSON")
    p.add_argument("--lidar", help="lidar parameter JSON")
    p.add_argument("--imu", help="IMU config JSON")
    p.add_argument("--register", help="registration config JSON")
    p.add_argument("--max-keyframes", type=int, default=10**9)
    p.add_argument("--publish", default="svn", choices=["svn", "ins"], help="lo_svn only")
    p.add_argument(
        "--anchor", default="ins", choices=["ins", "odom"],
        help="lo_svn only: pose at which keyframe clouds enter the target ring",
    )
    p.add_argument(
        "--method",
        choices=["NDT_OMP", "SVNNDT", "GICP", "NDT_OMP_MULTIRES"],
        help="odom_ndt only: override the registration engine "
        "(default: registration_method from --register)",
    )
    p.add_argument("--loop-closure", action="store_true",
                   help="odom_ndt only: detect loop closures and run the pose-graph refinement")
    p.add_argument(
        "--resume", help="ins_map / lo_svn: resume from a checkpoint (.npz)"
    )
    p.add_argument(
        "--save-checkpoint", help="ins_map / lo_svn: write a checkpoint (.npz)"
    )
    p.add_argument("--profile", action="store_true", help="write a jax profiler trace")
    p.add_argument(
        "--viz", action="store_true",
        help="serve a live point-cloud/trajectory viewer on localhost "
        "(the reference's PCL visualizer threads, run/pipeline.cpp:826-985)",
    )
    p.add_argument("--viz-port", type=int, default=8433)
    p.add_argument(
        "--viz-hold", type=float, default=0.0,
        help="seconds to keep serving the viewer after the replay finishes "
        "(0 exits immediately; negative holds until Ctrl-C)",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING)
    os.makedirs(args.out, exist_ok=True)

    viewer = None
    if args.viz:
        from slamtpu.apps.common import VizHook
        from slamtpu.runtime.viewer import LiveViewer

        viewer = LiveViewer(port=args.viz_port)
        print(f"live viewer: {viewer.url}")

    from slamtpu.runtime.config import PipelineConfig

    if args.meta:
        cfg = PipelineConfig.from_files(args.meta, args.lidar, args.imu, args.register)
    else:
        cfg = PipelineConfig.berlin()

    from slamtpu.runtime import checkpoint
    from slamtpu.runtime.export import write_trajectory_tum

    prof_ctx = None
    if args.profile:
        import jax

        prof_ctx = jax.profiler.trace(os.path.join(args.out, "jax_trace"))
        prof_ctx.__enter__()

    try:
        if args.app == "calib_compass":
            from slamtpu.apps import CalibCompassApp

            app = CalibCompassApp()
            frames = app.run_replay(args.replay, args.max_keyframes)
            app.export(os.path.join(args.out, "compass.csv"))
            print(f"decoded {len(frames)} nav frames -> {args.out}/compass.csv")
            return 0
        if args.app == "viz_lidar":
            import numpy as np

            from slamtpu.apps import VizLidarApp

            app = VizLidarApp(cfg)
            frames = app.run_replay(args.replay, min(args.max_keyframes, 1000))
            for i, fr in enumerate(frames[:10]):
                n = app.export_frame(fr, os.path.join(args.out, f"scan_{i:04d}.ply"))
                print(f"frame {fr.frame_id}: {n} points")
            if viewer is not None:
                hook = VizHook(viewer)
                for fr in frames:
                    sb = app.project(fr)
                    viewer.push_cloud(hook.subsample(sb), fr.frame_id)
                _viz_hold(viewer, args.viz_hold)
            return 0
        if args.app == "ins_map":
            from slamtpu.apps import InsMapApp

            app = InsMapApp(cfg)
            if viewer is not None:
                app.viz = VizHook(viewer)
            if args.resume:
                app.resume_from(args.resume)
            traj = app.run_replay(args.replay, args.max_keyframes)
            if args.save_checkpoint:
                app.save_checkpoint(args.save_checkpoint)
            app.finalize_and_export(os.path.join(args.out, "ndt_map"))
        elif args.app == "lo_svn":
            from slamtpu.apps import LoSvnApp

            app = LoSvnApp(cfg, publish=args.publish, anchor=args.anchor)
            if viewer is not None:
                app.viz = VizHook(viewer)
            if args.resume:
                app.resume_from(args.resume)
            traj = app.run_replay(args.replay, args.max_keyframes)
            if args.save_checkpoint:
                app.save_checkpoint(args.save_checkpoint)
        elif args.app == "odom_ndt":
            from slamtpu.apps import OdomNdtApp

            app = OdomNdtApp(cfg, loop_closure=args.loop_closure, method=args.method)
            if viewer is not None:
                app.viz = VizHook(viewer)
            traj = app.run_replay(args.replay, args.max_keyframes)
            if args.loop_closure:
                _, closures = app.refine_loop_closures()
                print(f"loop closures: {len(closures)}")
        elif args.app == "ligo_tc":
            from slamtpu.apps import LigoTcApp

            app = LigoTcApp(cfg)
            if viewer is not None:
                app.viz = VizHook(viewer)
            traj = app.run_replay(args.replay, args.max_keyframes)

        write_trajectory_tum(
            os.path.join(args.out, "trajectory.tum"),
            [e.timestamp for e in traj],
            [e.pose for e in traj],
        )
        checkpoint.save_trajectory(
            os.path.join(args.out, "trajectory.npz"),
            [e.timestamp for e in traj],
            [e.pose for e in traj],
            [e.frame_id for e in traj],
        )
        if hasattr(app, "stats"):
            app.stats.write_csv(os.path.join(args.out, "keyframe_stats.csv"))
        if hasattr(app, "timer"):
            print("stages:", app.timer.summary())
        print(f"{args.app}: {len(traj)} keyframes -> {args.out}/trajectory.tum")
        if viewer is not None:
            _viz_hold(viewer, args.viz_hold)
        return 0
    finally:
        if prof_ctx is not None:
            prof_ctx.__exit__(None, None, None)


if __name__ == "__main__":
    sys.exit(main())
