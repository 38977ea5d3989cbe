"""Loop-closure detection + pose-graph refinement on a drifting circular run."""
import jax
import jax.numpy as jnp
import numpy as np

from slamtpu.core import se3
from slamtpu.fusion.loop_closure import LoopClosure, LoopClosureConfig, LoopDetector, refine_trajectory
import pytest

# heavy lane: whole-app replays / multi-device suites / subprocess spawns;
# excluded from the default fast lane (pytest.ini: -m "not slow")
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(31)


def make_world_scan(pose, n=3000):
    """Synthetic body-frame scan of a pillar field seen from `pose`."""
    pillars = np.stack(
        [np.cos(np.linspace(0, 2 * np.pi, 13)[:-1]) * 18,
         np.sin(np.linspace(0, 2 * np.pi, 13)[:-1]) * 18,
         np.zeros(12)], -1
    )
    world_pts = pillars[RNG.integers(0, 12, n)] + RNG.normal(0, 0.4, (n, 3)) * [
        0.3, 0.3, 1.5
    ]
    body = se3.transform_points(se3.inverse(pose), jnp.asarray(world_pts, jnp.float64))
    return body, jnp.ones(n, bool)


class TestLoopDetector:
    def test_detects_and_refines(self):
        # circle of 30 keyframes, returns near start
        N = 30
        step = se3.from_rpy_xyz(
            jnp.asarray([0.0, 0.0, 2 * np.pi / N]), jnp.asarray([2 * np.pi * 10 / N, 0, 0])
        )
        gt = [se3.identity()]
        for _ in range(N - 1):
            gt.append(se3.compose(gt[-1], step))
        # drifting odometry
        rels, noisy = [], [gt[0]]
        for k in range(N - 1):
            rel = se3.between(gt[k], gt[k + 1])
            rel = se3.retract(rel, jnp.asarray([0, 0, 0.004, 0.02, 0.01, 0.0]))
            rels.append(rel)
            noisy.append(se3.compose(noisy[-1], rel))
        drift = float(jnp.linalg.norm(noisy[-1].trans - gt[-1].trans))
        assert drift > 0.3

        det = LoopDetector(
            LoopClosureConfig(min_keyframe_gap=15, search_radius=8.0, resolution=1.0,
                              max_fitness_error=2.0, min_contrib_ratio=0.1)
        )
        all_closures = []
        for k, pose in enumerate(noisy):
            pts, mask = make_world_scan(gt[k])  # scans from TRUE poses
            cls = det.add_keyframe(pose, pts, mask)
            all_closures.extend(cls)
        assert len(all_closures) >= 1, "no loop closures found"
        lc = all_closures[0]
        assert lc.j - lc.i >= 15
        # measured relative close to ground-truth relative
        rel_gt = se3.between(gt[lc.i], gt[lc.j])
        err = np.asarray(se3.local(rel_gt, se3.cast(lc.relative, jnp.float64)))
        assert np.linalg.norm(err[3:]) < 0.2, err

        covs = [np.eye(6) * 1e-4 for _ in rels]
        refined, result = refine_trajectory(noisy, rels, covs, all_closures)
        end_err_before = float(jnp.linalg.norm(noisy[-1].trans - gt[-1].trans))
        end_err_after = float(jnp.linalg.norm(refined[-1].trans - gt[-1].trans))
        assert end_err_after < end_err_before * 0.6, (end_err_before, end_err_after)

    def test_no_candidates_when_far_apart(self):
        # straight line, 3 m steps, gap 5 -> nearest non-recent keyframe is
        # 15 m away, outside the 5 m search radius: no candidates at all
        det = LoopDetector(LoopClosureConfig(min_keyframe_gap=5, search_radius=5.0))
        for k in range(20):
            pose = se3.from_rpy_xyz(jnp.zeros(3), jnp.asarray([k * 3.0, 0, 0]))
            pts, mask = make_world_scan(pose, n=500)
            closures = det.add_keyframe(pose, pts, mask)
            assert closures == []
