"""IMU preintegration, factor-graph smoother, pose-graph, and robustness tests."""
import jax
import jax.numpy as jnp
import numpy as np

from slamtpu.core import se3, so3
from slamtpu.core.se3 import Pose3
from slamtpu.fusion import (
    ImuBias,
    ImuNoise,
    NavState,
    PoseGraphConfig,
    SmootherConfig,
    WindowState,
    constant_velocity_predict,
    deviation_gated_blend,
    empty_factors,
    integrate,
    make_graph,
    marginal_covariance,
    predict,
    sqrt_info_from_sigmas,
    trust_gain_init,
    trust_gain_update,
)
from slamtpu.fusion import pose_graph as pg
from slamtpu.fusion import smoother
from slamtpu.fusion.preintegration import residual as imu_residual
import pytest

# heavy lane: whole-app replays / multi-device suites / subprocess spawns;
# excluded from the default fast lane (pytest.ini: -m "not slow")
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(13)
NOISE = ImuNoise(
    accel_noise_sigma=jnp.full(3, 1e-3),
    gyro_noise_sigma=jnp.full(3, 1e-4),
    accel_bias_rw_sigma=jnp.full(3, 1e-5),
    gyro_bias_rw_sigma=jnp.full(3, 1e-6),
)
GRAVITY = jnp.asarray([0.0, 0.0, 9.81])


class TestPreintegration:
    def test_constant_accel_analytic(self):
        n, dt = 100, 0.01
        accel = jnp.tile(jnp.asarray([1.0, 2.0, 3.0]), (n, 1))
        gyro = jnp.zeros((n, 3))
        dts = jnp.full(n, dt)
        pim = integrate(accel, gyro, dts, ImuBias.zero(), NOISE)
        T = n * dt
        np.testing.assert_allclose(float(pim.dt), T, atol=1e-12)
        np.testing.assert_allclose(np.asarray(pim.dv), [1 * T, 2 * T, 3 * T], atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(pim.dp), 0.5 * np.array([1, 2, 3]) * T**2, rtol=0, atol=0.5 * dt * T * 3.1
        )
        np.testing.assert_allclose(np.asarray(pim.dR), np.eye(3), atol=1e-12)

    def test_constant_rotation(self):
        n, dt = 200, 0.005
        w = jnp.asarray([0.1, -0.2, 0.3])
        pim = integrate(jnp.zeros((n, 3)), jnp.tile(w, (n, 1)), jnp.full(n, dt),
                        ImuBias.zero(), NOISE)
        R_expect = np.asarray(so3.exp(w * (n * dt)))
        np.testing.assert_allclose(np.asarray(pim.dR), R_expect, atol=1e-9)

    def test_padding_noop(self):
        n = 50
        accel = jnp.asarray(RNG.normal(size=(n, 3)))
        gyro = jnp.asarray(RNG.normal(size=(n, 3)) * 0.1)
        dts = jnp.full(n, 0.01)
        a = integrate(accel, gyro, dts, ImuBias.zero(), NOISE)
        padded = integrate(
            jnp.concatenate([accel, jnp.ones((7, 3)) * 1e9]),
            jnp.concatenate([gyro, jnp.ones((7, 3))]),
            jnp.concatenate([dts, jnp.zeros(7)]),
            ImuBias.zero(),
            NOISE,
        )
        np.testing.assert_allclose(np.asarray(padded.dR), np.asarray(a.dR), atol=1e-15)
        np.testing.assert_allclose(np.asarray(padded.dv), np.asarray(a.dv), atol=1e-15)
        np.testing.assert_allclose(np.asarray(padded.cov), np.asarray(a.cov), atol=1e-18)

    def test_bias_jacobian_first_order(self):
        n = 80
        accel = jnp.asarray(RNG.normal(size=(n, 3)) + np.array([0, 0, 9.81]))
        gyro = jnp.asarray(RNG.normal(size=(n, 3)) * 0.2)
        dts = jnp.full(n, 0.01)
        pim0 = integrate(accel, gyro, dts, ImuBias.zero(), NOISE)
        db = np.array([3e-4, -2e-4, 1e-4, -1e-4, 2e-4, 3e-4])
        bias = ImuBias(jnp.asarray(db[:3]), jnp.asarray(db[3:]))
        pim_b = integrate(accel, gyro, dts, bias, NOISE)
        from slamtpu.fusion import bias_corrected_deltas

        dR_c, dv_c, dp_c = bias_corrected_deltas(pim0, bias)
        np.testing.assert_allclose(np.asarray(dv_c), np.asarray(pim_b.dv), atol=5e-6)
        np.testing.assert_allclose(np.asarray(dp_c), np.asarray(pim_b.dp), atol=5e-6)
        np.testing.assert_allclose(np.asarray(dR_c), np.asarray(pim_b.dR), atol=5e-6)

    def _simulate(self, n=200, dt=0.005):
        """True trajectory + perfect IMU measurements (with gravity)."""
        w_true = np.array([0.05, -0.1, 0.3])
        a_world = np.array([0.2, -0.1, 0.05])
        R = np.eye(3)
        p = np.zeros(3)
        v = np.array([1.0, 0.0, 0.0])
        accels, gyros = [], []
        g = np.array([0.0, 0.0, 9.81])
        for _ in range(n):
            # specific force measured in body: f = R^T (a_world - g)
            accels.append(R.T @ (a_world - g))
            gyros.append(w_true)
            Rdot = R @ np.asarray(so3.exp(jnp.asarray(w_true * dt)))
            p = p + v * dt + 0.5 * a_world * dt * dt
            v = v + a_world * dt
            R = Rdot
        return (
            np.stack(accels),
            np.stack(gyros),
            np.full(n, dt),
            NavState(Pose3(jnp.eye(3), jnp.zeros(3)), jnp.asarray([1.0, 0.0, 0.0])),
            NavState(Pose3(jnp.asarray(R), jnp.asarray(p)), jnp.asarray(v)),
        )

    def test_predict_matches_simulation(self):
        accel, gyro, dts, s0, s1 = self._simulate()
        pim = integrate(jnp.asarray(accel), jnp.asarray(gyro), jnp.asarray(dts),
                        ImuBias.zero(), NOISE)
        pred = predict(s0, ImuBias.zero(), pim, GRAVITY)
        np.testing.assert_allclose(np.asarray(pred.pose.trans), np.asarray(s1.pose.trans), atol=1e-3)
        np.testing.assert_allclose(np.asarray(pred.vel), np.asarray(s1.vel), atol=1e-3)
        np.testing.assert_allclose(np.asarray(pred.pose.rot), np.asarray(s1.pose.rot), atol=1e-6)

    def test_residual_zero_at_truth(self):
        accel, gyro, dts, s0, s1 = self._simulate()
        pim = integrate(jnp.asarray(accel), jnp.asarray(gyro), jnp.asarray(dts),
                        ImuBias.zero(), NOISE)
        pred = predict(s0, ImuBias.zero(), pim, GRAVITY)
        r = imu_residual(s0, ImuBias.zero(), pred, pim, GRAVITY)
        np.testing.assert_allclose(np.asarray(r), np.zeros(9), atol=1e-10)

    def test_covariance_grows_and_psd(self):
        n = 100
        pim = integrate(jnp.zeros((n, 3)), jnp.zeros((n, 3)), jnp.full(n, 0.01),
                        ImuBias.zero(), NOISE)
        cov = np.asarray(pim.cov)
        ev = np.linalg.eigvalsh(cov)
        assert ev.min() >= -1e-18
        assert cov[0, 0] > 0 and cov[3, 3] > 0 and cov[6, 6] > 0


class TestSmoother:
    def window(self, W=4):
        return WindowState.identity(W)._replace(active=jnp.ones(W, bool))

    def test_prior_and_between_chain(self):
        # gt poses: x_i at [i, 0, 0] yaw i*0.1; prior on x0, betweens i->i+1
        W = 4
        gt = [se3.from_rpy_xyz(jnp.asarray([0, 0, 0.1 * i]), jnp.asarray([float(i), 0, 0]))
              for i in range(W)]
        factors = empty_factors(1, W - 1, 1, 1, 0, 0)
        fp = factors.prior_pose
        fp = fp._replace(
            idx=jnp.asarray([0], jnp.int32),
            rot=gt[0].rot[None],
            trans=gt[0].trans[None],
            sqrt_info=jnp.eye(6)[None] * 100.0,
            active=jnp.asarray([True]),
        )
        rels = [se3.between(gt[i], gt[i + 1]) for i in range(W - 1)]
        fb = factors.between._replace(
            i=jnp.arange(W - 1, dtype=jnp.int32),
            j=jnp.arange(1, W, dtype=jnp.int32),
            rot=jnp.stack([r.rot for r in rels]),
            trans=jnp.stack([r.trans for r in rels]),
            sqrt_info=jnp.broadcast_to(jnp.eye(6) * 10.0, (W - 1, 6, 6)),
            active=jnp.ones(W - 1, bool),
        )
        factors = factors._replace(prior_pose=fp, between=fb)
        res = smoother.optimize(self.window(W), factors, SmootherConfig(iterations=10))
        for i in range(W):
            err = np.asarray(se3.local(gt[i], res.state.pose(i)))
            assert np.linalg.norm(err) < 1e-6, (i, err)

    def test_marginal_covariance_of_prior_only(self):
        W = 2
        sigmas = jnp.asarray([0.1, 0.1, 0.1, 0.2, 0.2, 0.2])
        factors = empty_factors(1, 0, 1, 1, 0, 0)
        fp = factors.prior_pose._replace(
            idx=jnp.asarray([0], jnp.int32),
            sqrt_info=sqrt_info_from_sigmas(sigmas)[None],
            active=jnp.asarray([True]),
        )
        fv = factors.prior_vel._replace(
            idx=jnp.asarray([0], jnp.int32), active=jnp.asarray([True])
        )
        fbias = factors.prior_bias._replace(
            idx=jnp.asarray([0], jnp.int32), active=jnp.asarray([True])
        )
        factors = factors._replace(prior_pose=fp, prior_vel=fv, prior_bias=fbias)
        st = WindowState.identity(W)._replace(active=jnp.asarray([True, False]))
        res = smoother.optimize(st, factors, SmootherConfig(iterations=3))
        cov = np.asarray(marginal_covariance(res.hessian, 0))
        np.testing.assert_allclose(np.sqrt(np.diag(cov)[:6]), np.asarray(sigmas), rtol=1e-6)

    def test_imu_factor_window(self):
        # two states connected by a perfect IMU window + priors on state 0
        n, dt = 100, 0.01
        accel = np.tile(np.array([0.0, 0.0, -9.81]), (n, 1))  # stationary: f = -g in body
        pim = integrate(jnp.asarray(accel + [0.5, 0, 0]), jnp.zeros((n, 3)),
                        jnp.full(n, dt), ImuBias.zero(), NOISE)
        # moving: accel world = [0.5,0,0]
        T = n * dt
        gt1_t = np.array([0.5 * 0.5 * T * T, 0, 0])
        gt1_v = np.array([0.5 * T, 0, 0])

        factors = empty_factors(1, 0, 1, 1, 1, 0)
        factors = factors._replace(
            prior_pose=factors.prior_pose._replace(
                idx=jnp.asarray([0], jnp.int32),
                sqrt_info=jnp.eye(6)[None] * 1e3,
                active=jnp.asarray([True]),
            ),
            prior_vel=factors.prior_vel._replace(
                idx=jnp.asarray([0], jnp.int32),
                sqrt_info=jnp.eye(3)[None] * 1e3,
                active=jnp.asarray([True]),
            ),
            prior_bias=factors.prior_bias._replace(
                idx=jnp.asarray([0], jnp.int32),
                sqrt_info=jnp.eye(6)[None] * 1e3,
                active=jnp.asarray([True]),
            ),
            imu=factors.imu._replace(
                i=jnp.asarray([0], jnp.int32),
                j=jnp.asarray([1], jnp.int32),
                dR=pim.dR[None],
                dv=pim.dv[None],
                dp=pim.dp[None],
                dt=pim.dt[None],
                dR_dbg=pim.dR_dbg[None],
                dv_dba=pim.dv_dba[None],
                dv_dbg=pim.dv_dbg[None],
                dp_dba=pim.dp_dba[None],
                dp_dbg=pim.dp_dbg[None],
                bias_hat=jnp.zeros((1, 6)),
                sqrt_info=jnp.eye(15)[None] * 10.0,
                active=jnp.asarray([True]),
            ),
            gravity=GRAVITY,
        )
        st = WindowState.identity(2)._replace(active=jnp.ones(2, bool))
        res = smoother.optimize(st, factors, SmootherConfig(iterations=10))
        np.testing.assert_allclose(np.asarray(res.state.trans[1]), gt1_t, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.state.vel[1]), gt1_v, atol=1e-4)


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self):
        # square loop: 4 sides of 10 m, 90 deg turns; odometry has drift,
        # loop closure 3->0 is exact
        N = 16
        gt = [se3.identity()]
        step = se3.from_rpy_xyz(jnp.asarray([0.0, 0, np.pi * 2 / N]), jnp.asarray([2.0, 0, 0]))
        for _ in range(N - 1):
            gt.append(se3.compose(gt[-1], step))
        poses_gt = Pose3(jnp.stack([g.rot for g in gt]), jnp.stack([g.trans for g in gt]))
        # noisy odometry chain
        noise = RNG.normal(size=(N - 1, 6)) * np.array([0.002] * 3 + [0.03] * 3)
        rels, init = [], [gt[0]]
        for k in range(N - 1):
            rel = se3.retract(se3.between(gt[k], gt[k + 1]), jnp.asarray(noise[k]))
            rels.append(rel)
            init.append(se3.compose(init[-1], rel))
        init_poses = Pose3(jnp.stack([p.rot for p in init]), jnp.stack([p.trans for p in init]))
        drift = float(jnp.linalg.norm(init_poses.trans[-1] - poses_gt.trans[-1]))
        assert drift > 0.05
        # factors: odometry + exact loop closure (N-1 -> 0)
        i = jnp.asarray(list(range(N - 1)) + [N - 1], jnp.int32)
        j = jnp.asarray(list(range(1, N)) + [0], jnp.int32)
        loop_rel = se3.between(gt[N - 1], gt[0])
        rel_all = Pose3(
            jnp.stack([r.rot for r in rels] + [loop_rel.rot]),
            jnp.stack([r.trans for r in rels] + [loop_rel.trans]),
        )
        si = jnp.broadcast_to(jnp.eye(6), (N, 6, 6)).at[N - 1].mul(10.0)
        graph = make_graph(init_poses, i, j, rel_all, si)
        res = pg.optimize(graph, PoseGraphConfig(gn_iterations=10, cg_iterations=40))
        end_err = float(jnp.linalg.norm(res.poses.trans[-1] - poses_gt.trans[-1]))
        assert end_err < drift * 0.5, (end_err, drift)
        # anchored node unchanged
        np.testing.assert_allclose(
            np.asarray(res.poses.trans[0]), np.asarray(init_poses.trans[0]), atol=1e-12
        )

    def test_consistent_graph_zero_error(self):
        N = 5
        gt = [se3.expmap(jnp.asarray(RNG.normal(size=6) * 0.3)) for _ in range(N)]
        poses = Pose3(jnp.stack([g.rot for g in gt]), jnp.stack([g.trans for g in gt]))
        i = jnp.asarray(range(N - 1), jnp.int32)
        j = jnp.asarray(range(1, N), jnp.int32)
        rels = [se3.between(gt[k], gt[k + 1]) for k in range(N - 1)]
        rel = Pose3(jnp.stack([r.rot for r in rels]), jnp.stack([r.trans for r in rels]))
        graph = make_graph(poses, i, j, rel, jnp.broadcast_to(jnp.eye(6), (N - 1, 6, 6)))
        res = pg.optimize(graph, PoseGraphConfig(gn_iterations=3, cg_iterations=20))
        assert float(res.error) < 1e-20


class TestRobust:
    def test_trust_gain_cycle(self):
        st = trust_gain_init()
        # available -> scale 1
        st, scale = trust_gain_update(st, jnp.asarray(0.01))
        assert float(scale) == 1.0
        # denied -> scale 100
        st, scale = trust_gain_update(st, jnp.asarray(0.5))
        assert float(scale) == 100.0
        # recovery: first frame back resets trust to ~0 -> scale near 100
        st, scale = trust_gain_update(st, jnp.asarray(0.01))
        np.testing.assert_allclose(float(scale), 100 + 0.005 * (1 - 100), rtol=1e-9)
        # after 200 frames, fully recovered
        for _ in range(200):
            st, scale = trust_gain_update(st, jnp.asarray(0.01))
        assert float(scale) == 1.0

    def test_deviation_blend(self):
        pred = se3.expmap(jnp.asarray([0.0, 0, 0.1, 1.0, 0, 0]))
        # identical -> full trust, returns measurement
        blended, w = deviation_gated_blend(pred, pred)
        assert float(w) == 1.0
        np.testing.assert_allclose(np.asarray(blended.trans), np.asarray(pred.trans), atol=1e-12)
        # huge deviation -> zero trust, returns prediction
        far = se3.retract(pred, jnp.asarray([0.0, 0, 0.5, 5.0, 0, 0]))
        blended, w = deviation_gated_blend(pred, far)
        assert float(w) == 0.0
        np.testing.assert_allclose(np.asarray(blended.trans), np.asarray(pred.trans), atol=1e-9)

    def test_constant_velocity(self):
        a = se3.identity()
        b = se3.expmap(jnp.asarray([0.0, 0, 0.1, 1.0, 0, 0]))
        c = constant_velocity_predict(a, b)
        # c = b * (a^-1 b): applying the same delta again
        expect = se3.compose(b, se3.between(a, b))
        np.testing.assert_allclose(np.asarray(c.matrix()), np.asarray(expect.matrix()), atol=1e-12)


class TestReorderCovariance:
    def test_permutation_correct_and_involutory(self):
        from slamtpu.fusion.graph import reorder_covariance_trans_rot

        B = RNG.normal(size=(6, 6))
        C = B @ B.T
        out = np.asarray(reorder_covariance_trans_rot(jnp.asarray(C)))
        P = np.zeros((6, 6))
        P[:3, 3:] = np.eye(3)
        P[3:, :3] = np.eye(3)
        np.testing.assert_allclose(out, P @ C @ P.T, atol=1e-12)
        # involution
        back = np.asarray(reorder_covariance_trans_rot(jnp.asarray(out)))
        np.testing.assert_allclose(back, C, atol=1e-12)


class TestPoseGraphScale:
    def test_1000_pose_circle_with_closures(self):
        """Mid-scale CPU guard for the PCG pose-graph solver (bench runs 10k
        on device): generator uses float64 closed forms, see bench.py notes
        on f32 between/compose chains."""
        n = 1000
        rng = np.random.default_rng(3)
        radius = 100.0
        yaw = 2 * np.pi * np.arange(n) / n
        t64 = np.stack([radius * np.sin(yaw), radius * (1 - np.cos(yaw)), np.zeros(n)], -1)
        cy, sy = np.cos(yaw), np.sin(yaw)
        z, o = np.zeros(n), np.ones(n)
        R64 = np.stack([np.stack([cy, -sy, z], -1), np.stack([sy, cy, z], -1),
                        np.stack([z, z, o], -1)], 1)
        rel_R = np.einsum("nji,njk->nik", R64[:-1], R64[1:])
        rel_t = np.einsum("nji,nj->ni", R64[:-1], t64[1:] - t64[:-1])
        noise = rng.normal(size=(n - 1, 6)) * np.array([2e-4] * 3 + [5e-3] * 3)
        rel = se3.retract(Pose3(jnp.asarray(rel_R), jnp.asarray(rel_t)), jnp.asarray(noise))
        rr, rt = np.asarray(rel.rot), np.asarray(rel.trans)
        init_R, init_t = np.empty_like(R64), np.empty_like(t64)
        init_R[0], init_t[0] = R64[0], t64[0]
        for k in range(n - 1):
            init_t[k + 1] = init_t[k] + init_R[k] @ rt[k]
            init_R[k + 1] = init_R[k] @ rr[k]
        drift = np.linalg.norm(init_t[-1] - t64[-1])
        assert drift > 0.2
        # odometry + 20 circle-closing factors
        li = rng.integers(0, 20, 20)
        lj = n - 20 + rng.integers(0, 20, 20)
        lr_R = np.einsum("nji,njk->nik", R64[li], R64[lj])
        lr_t = np.einsum("nji,nj->ni", R64[li], t64[lj] - t64[li])
        i = jnp.concatenate([jnp.arange(n - 1), jnp.asarray(li)]).astype(jnp.int32)
        j = jnp.concatenate([jnp.arange(1, n), jnp.asarray(lj)]).astype(jnp.int32)
        rel_all = Pose3(
            jnp.concatenate([rel.rot, jnp.asarray(lr_R)]),
            jnp.concatenate([rel.trans, jnp.asarray(lr_t)]),
        )
        si = jnp.broadcast_to(jnp.eye(6) * 100.0, (int(i.shape[0]), 6, 6))
        graph = make_graph(Pose3(jnp.asarray(init_R), jnp.asarray(init_t)), i, j, rel_all, si)
        res = pg.optimize(graph, PoseGraphConfig(gn_iterations=6, cg_iterations=50))
        drift_after = float(jnp.linalg.norm(res.poses.trans[-1] - jnp.asarray(t64[-1])))
        assert drift_after < drift * 0.2, (drift, drift_after)


class TestHostTwins:
    """The apps run host-numpy twins of jax functions; pin them together."""

    def test_trust_gain_np_matches_jax(self):
        from slamtpu.fusion import robust

        st_j = robust.trust_gain_init()
        st_n = robust.trust_gain_init_np()
        rng = np.random.default_rng(0)
        for k in range(50):
            sigma = float(rng.choice([0.01, 0.05, 0.2, 1.5]))
            st_j, scale_j = robust.trust_gain_update(st_j, jnp.asarray(sigma))
            st_n, scale_n = robust.trust_gain_update_np(st_n, sigma)
            assert bool(st_j.was_denied) == st_n[0], k
            np.testing.assert_allclose(float(st_j.trust), st_n[1], atol=1e-12)
            np.testing.assert_allclose(float(scale_j), scale_n, atol=1e-9)


class TestPoseOnlySmoother:
    """optimize_pose_window must match the 15-dof smoother on pose-only
    graphs (the odometry graph: INS priors + NDT between chain) — same
    residuals, 6W-dof equilibrated-Cholesky solve instead of 15W-dof QR."""

    def _random_graph(self, W, seed=7):
        rng = np.random.default_rng(seed)
        gt = [se3.identity()]
        for i in range(W - 1):
            gt.append(
                se3.compose(
                    gt[-1],
                    se3.from_rpy_xyz(
                        jnp.asarray(rng.normal(0, 0.05, 3)),
                        jnp.asarray(rng.normal(0, 1.0, 3)),
                    ),
                )
            )
        # noisy INS priors on every state, exact-ish betweens with full cov
        fp_rot = jnp.stack([
            se3.compose(g, se3.from_rpy_xyz(
                jnp.asarray(rng.normal(0, 0.01, 3)), jnp.asarray(rng.normal(0, 0.05, 3))
            )).rot for g in gt])
        fp_trans = jnp.stack([
            se3.compose(g, se3.from_rpy_xyz(
                jnp.asarray(rng.normal(0, 0.01, 3)), jnp.asarray(rng.normal(0, 0.05, 3))
            )).trans for g in gt])
        fp_si = jnp.stack([jnp.diag(jnp.asarray(1.0 / rng.uniform(0.02, 0.2, 6)))
                           for _ in range(W)])
        rels = [se3.between(gt[i], gt[i + 1]) for i in range(W - 1)]
        fb_rot = jnp.stack([r.rot for r in rels])
        fb_trans = jnp.stack([r.trans for r in rels])
        fb_si = jnp.broadcast_to(jnp.eye(6) * 50.0, (W - 1, 6, 6))
        init_rot = jnp.stack([g.rot for g in gt])
        init_trans = jnp.stack([g.trans + rng.normal(0, 0.1, 3) for g in gt])
        return (init_rot, init_trans, fp_rot, fp_trans, fp_si, fb_rot, fb_trans, fb_si)

    def test_matches_full_smoother_on_pose_only_graph(self):
        W = 6
        (init_rot, init_trans, fp_rot, fp_trans, fp_si,
         fb_rot, fb_trans, fb_si) = self._random_graph(W)
        active = jnp.asarray([True] * 5 + [False])
        b_active = jnp.asarray([True] * 4 + [False])

        res_p = smoother.optimize_pose_window(
            init_rot, init_trans, active, fp_rot, fp_trans, fp_si,
            fb_rot, fb_trans, fb_si, b_active, iterations=8,
        )

        st = WindowState(
            rot=init_rot, trans=init_trans,
            vel=jnp.zeros((W, 3)), bias=jnp.zeros((W, 6)), active=active,
        )
        tpl = empty_factors(W, W - 1, 0, 0, 0, 0)
        factors = tpl._replace(
            prior_pose=tpl.prior_pose._replace(
                idx=jnp.arange(W, dtype=jnp.int32), rot=fp_rot, trans=fp_trans,
                sqrt_info=fp_si, active=active,
            ),
            between=tpl.between._replace(
                i=jnp.arange(W - 1, dtype=jnp.int32),
                j=jnp.arange(1, W, dtype=jnp.int32),
                rot=fb_rot, trans=fb_trans, sqrt_info=fb_si, active=b_active,
            ),
        )
        res_f = smoother.optimize(st, factors, SmootherConfig(iterations=8))

        for k in range(5):
            gap = np.asarray(se3.local(
                Pose3(res_f.state.rot[k], res_f.state.trans[k]),
                Pose3(res_p.rot[k], res_p.trans[k]),
            ))
            assert np.linalg.norm(gap) < 1e-6, (k, gap)
        # marginal covariance pose block agrees (vel/bias decouple exactly)
        cov_p = np.asarray(smoother.pose_marginal_covariance(res_p.hessian, 4))
        cov_f = np.asarray(marginal_covariance(res_f.hessian, 4))[:6, :6]
        np.testing.assert_allclose(cov_p, cov_f, rtol=1e-5, atol=1e-10)

    def test_f32_conditioning(self):
        """Extreme info-magnitude spread (sigma floor 1e-6 priors next to
        O(1) priors) must not destabilize the f32 solve."""
        W = 4
        (init_rot, init_trans, fp_rot, fp_trans, fp_si,
         fb_rot, fb_trans, fb_si) = self._random_graph(W, seed=11)
        fp_si = fp_si.at[0].set(jnp.eye(6) * 1e6)  # sigma floor: info 1e12 in H
        active = jnp.ones(W, bool)
        b_active = jnp.ones(W - 1, bool)
        args32 = [jnp.asarray(a, jnp.float32) for a in (
            init_rot, init_trans, fp_rot, fp_trans, fp_si, fb_rot, fb_trans, fb_si)]
        res = smoother.optimize_pose_window(
            args32[0], args32[1], active, args32[2], args32[3], args32[4],
            args32[5], args32[6], args32[7], b_active, iterations=6,
        )
        assert np.isfinite(np.asarray(res.trans)).all()
        assert np.isfinite(np.asarray(res.rot)).all()
        # state 0 pinned hard to its prior by the 1e-6-sigma factor
        gap = np.asarray(se3.local(
            Pose3(args32[2][0], args32[3][0]), Pose3(res.rot[0], res.trans[0])))
        assert np.linalg.norm(gap) < 1e-4, gap
