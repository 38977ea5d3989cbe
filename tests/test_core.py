"""Unit tests for slamtpu.core: SO(3)/SE(3) algebra and batched linalg.

Oracles: scipy.spatial.transform.Rotation when available, otherwise numpy
reference implementations; numpy.linalg.eigh for the 3x3 eigendecomposition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamtpu.core import linalg, se3, so3

RNG = np.random.default_rng(1337)


def random_rotvecs(shape, scale=np.pi * 0.9):
    w = RNG.normal(size=shape + (3,))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    mag = RNG.uniform(1e-9, scale, size=shape + (1,))
    return (w * mag).astype(np.float64)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = random_rotvecs((128,))
        R = so3.exp(jnp.asarray(w))
        w2 = so3.log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-9)

    def test_exp_matches_rodrigues_oracle(self):
        w = random_rotvecs((64,))
        R = np.asarray(so3.exp(jnp.asarray(w)))
        for i in range(len(w)):
            th = np.linalg.norm(w[i])
            K = np.array(
                [
                    [0, -w[i][2], w[i][1]],
                    [w[i][2], 0, -w[i][0]],
                    [-w[i][1], w[i][0], 0],
                ]
            )
            R_o = np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * K @ K
            np.testing.assert_allclose(R[i], R_o, atol=1e-12)

    def test_small_angle(self):
        w = jnp.asarray([[1e-12, 0, 0], [0.0, 0, 0]])
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-11)
        assert np.isfinite(np.asarray(so3.log(R))).all()

    def test_log_near_pi(self):
        w = np.array([[np.pi - 1e-7, 0, 0], [0, np.pi - 1e-7, 0]])
        R = so3.exp(jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(so3.log(R)), w, atol=1e-6)

    def test_rpy_roundtrip_and_convention(self):
        rpy = RNG.uniform(-1.2, 1.2, size=(64, 3))
        R = np.asarray(so3.rpy_to_rot(jnp.asarray(rpy)))
        # R must equal Rz(y) Ry(p) Rx(r) (GTSAM RzRyRx convention)
        def rx(a):
            return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

        def ry(a):
            return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

        def rz(a):
            return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

        for i in range(8):
            r, p, y = rpy[i]
            np.testing.assert_allclose(R[i], rz(y) @ ry(p) @ rx(r), atol=1e-12)
        rpy2 = np.asarray(so3.rot_to_rpy(jnp.asarray(R)))
        np.testing.assert_allclose(rpy2, rpy, atol=1e-9)

    def test_quat_roundtrip(self):
        w = random_rotvecs((256,))
        R = so3.exp(jnp.asarray(w))
        q = so3.rot_to_quat(R)
        R2 = so3.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-12)

    def test_quat_slerp_endpoints_and_midpoint(self):
        w = random_rotvecs((16,))
        q0 = so3.rot_to_quat(so3.exp(jnp.asarray(w)))
        q1 = so3.rot_to_quat(so3.exp(jnp.asarray(random_rotvecs((16,)))))
        np.testing.assert_allclose(
            np.abs(np.sum(np.asarray(so3.quat_slerp(q0, q1, jnp.asarray(0.0))) * np.asarray(q0), axis=-1)),
            1.0,
            atol=1e-9,
        )
        # midpoint is equidistant
        qm = so3.quat_slerp(q0, q1, jnp.asarray(0.5))
        Rm, R0, R1 = (so3.quat_to_rot(x) for x in (qm, q0, q1))
        d0 = np.linalg.norm(np.asarray(so3.log(jnp.swapaxes(R0, -1, -2) @ Rm)), axis=-1)
        d1 = np.linalg.norm(np.asarray(so3.log(jnp.swapaxes(R1, -1, -2) @ Rm)), axis=-1)
        np.testing.assert_allclose(d0, d1, atol=1e-7)

    def test_left_jacobian_inverse(self):
        w = jnp.asarray(random_rotvecs((32,)))
        J = so3.left_jacobian(w)
        Ji = so3.left_jacobian_inv(w)
        np.testing.assert_allclose(
            np.asarray(J @ Ji), np.eye(3)[None].repeat(32, 0), atol=1e-10
        )


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = RNG.normal(size=(128, 6))
        xi[:, :3] = random_rotvecs((128,))
        p = se3.expmap(jnp.asarray(xi))
        xi2 = se3.logmap(p)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-9)

    def test_exp_matches_matrix_expm(self):
        from scipy.linalg import expm

        xi = RNG.normal(size=(8, 6)) * 0.7
        P = se3.expmap(jnp.asarray(xi))
        T = np.asarray(P.matrix())
        for i in range(8):
            X = np.zeros((4, 4))
            w, v = xi[i, :3], xi[i, 3:]
            X[:3, :3] = np.array(
                [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
            )
            X[:3, 3] = v
            np.testing.assert_allclose(T[i], expm(X), atol=1e-12)

    def test_compose_between_retract(self):
        xi = jnp.asarray(RNG.normal(size=(32, 6)) * 0.5)
        a = se3.expmap(xi)
        d = jnp.asarray(RNG.normal(size=(32, 6)) * 0.3)
        b = se3.retract(a, d)
        np.testing.assert_allclose(np.asarray(se3.local(a, b)), np.asarray(d), atol=1e-10)
        ab = se3.compose(a, se3.inverse(a))
        np.testing.assert_allclose(np.asarray(ab.trans), 0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ab.rot), np.eye(3)[None].repeat(32, 0), atol=1e-12)

    def test_transform_points(self):
        xi = jnp.asarray(RNG.normal(size=(6,)) * 0.5)
        p = se3.expmap(xi)
        pts = jnp.asarray(RNG.normal(size=(100, 3)))
        out = se3.transform_points(p, pts)
        T = np.asarray(p.matrix())
        oracle = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-12)

    def test_adjoint_identity(self):
        # Exp(Ad_T xi) = T Exp(xi) T^-1
        xi = jnp.asarray(RNG.normal(size=(6,)) * 0.2)
        T = se3.expmap(jnp.asarray(RNG.normal(size=(6,)) * 0.5))
        lhs = se3.expmap(se3.adjoint(T) @ xi)
        rhs = se3.compose(se3.compose(T, se3.expmap(xi)), se3.inverse(T))
        np.testing.assert_allclose(np.asarray(lhs.matrix()), np.asarray(rhs.matrix()), atol=1e-10)


class TestLinalg:
    def test_sym_eig3x3_random(self):
        A = RNG.normal(size=(512, 3, 3))
        A = A + np.swapaxes(A, -1, -2)
        evals, evecs = linalg.sym_eig3x3(jnp.asarray(A))
        ev_np, evec_np = np.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(evals), ev_np, atol=1e-10)
        # reconstruction check (eigvec signs/order may differ)
        recon = np.einsum("...ij,...j,...kj->...ik", np.asarray(evecs), np.asarray(evals), np.asarray(evecs))
        np.testing.assert_allclose(recon, A, atol=1e-9)

    def test_sym_eig3x3_degenerate(self):
        cases = np.stack(
            [
                np.eye(3),
                np.diag([1.0, 1.0, 5.0]),
                np.diag([2.0, 2.0, 2.0]),
                np.zeros((3, 3)),
                np.diag([1e-12, 1e-12, 1.0]),
                np.diag([1e8, 1e8, 1e-8]),
            ]
        )
        evals, evecs = linalg.sym_eig3x3(jnp.asarray(cases))
        recon = np.einsum("...ij,...j,...kj->...ik", np.asarray(evecs), np.asarray(evals), np.asarray(evecs))
        np.testing.assert_allclose(recon, cases, atol=1e-6)
        # orthonormal
        vtv = np.einsum("...ji,...jk->...ik", np.asarray(evecs), np.asarray(evecs))
        np.testing.assert_allclose(vtv, np.eye(3)[None].repeat(len(cases), 0), atol=1e-10)

    def test_inv3x3(self):
        A = RNG.normal(size=(128, 3, 3)) + 3 * np.eye(3)
        Ai = np.asarray(linalg.inv3x3(jnp.asarray(A)))
        np.testing.assert_allclose(Ai @ A, np.eye(3)[None].repeat(128, 0), atol=1e-9)

    def test_psd_solve(self):
        B = RNG.normal(size=(64, 6, 6))
        A = B @ np.swapaxes(B, -1, -2) + 6 * np.eye(6)
        b = RNG.normal(size=(64, 6))
        x = np.asarray(linalg.psd_solve(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(np.einsum("...ij,...j->...i", A, x), b, atol=1e-9)

    def test_eig_floor_psd(self):
        A = np.diag([1e-12, 0.5, 2.0])
        out = np.asarray(linalg.eig_floor_psd(jnp.asarray(A), 1e-9))
        ev = np.linalg.eigvalsh(out)
        assert ev.min() >= 1e-9 * (1 - 1e-6)

    def test_f32_path_jits(self):
        A = jnp.asarray(RNG.normal(size=(16, 3, 3)), dtype=jnp.float32)
        A = A @ jnp.swapaxes(A, -1, -2)
        evals, evecs = jax.jit(linalg.sym_eig3x3)(A)
        assert evals.dtype == jnp.float32
        recon = np.einsum("...ij,...j,...kj->...ik", np.asarray(evecs), np.asarray(evals), np.asarray(evecs))
        np.testing.assert_allclose(recon, np.asarray(A), atol=1e-4)
