"""Hand-transcribed parity vignettes against LITERAL values.

tests/oracles.py re-derives the reference math in numpy, but a same-author
oracle can share a misreading with the implementation. Each case here was
worked through BY HAND from the reference C++ statements (file:line cited per
case) with plain ``math`` arithmetic, and the results are embedded as decimal
literals — an independent check that the pipeline reproduces the reference's
numbers, not just its own oracle's.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slamtpu.core import se3
from slamtpu.mapping import gaussian_map, voxel
from slamtpu.ndt import gauss_constants
from slamtpu.ndt.objective import score_grad_hess


class TestGaussConstantsVignette:
    def test_shipped_config_literals(self):
        """resolution=1.0, outlier_ratio=0.55 (the shipped svn_ndt config).

        Transcribed from svn_ndt_impl.hpp:90-115:
          c1 = 10(1-0.55) = 4.5;  c2 = 0.55/1^3 = 0.55
          d3 = -log(0.55)                 = 0.5978370007556204
          d1 = -log(5.05) - d3            = -2.217225244042889
          inner = 4.5 e^{-1/2} + 0.55
          d2 = -2 log((-log(inner)-d3)/d1) = 0.43312300470355464
        """
        d1, d2, d3 = gauss_constants(1.0, 0.55)
        assert d1 == pytest.approx(-2.217225244042889, abs=1e-15)
        assert d2 == pytest.approx(0.43312300470355464, abs=1e-15)
        assert d3 == pytest.approx(0.5978370007556204, abs=1e-15)


class TestVoxelCovarianceVignette:
    def test_planar_eight_point_cell_literals(self):
        """One 8-point coplanar cell through the two-pass build + finalize.

        Hand-worked per voxel_grid_covariance_impl.hpp:276-331: the points
        are the voxel center c=(0.5,0.5,0.5) plus offsets (+-0.3, +-0.3, 0)
        in the 8 sign/axis combinations below. By symmetry mean = c exactly;
        sum of squared offsets per x/y axis = 6 * 0.09 = 0.54, cross terms
        cancel, z is identically 0:
          cov_raw  = diag(0.54/8, 0.54/8, 0)
          Bessel x 8/7 -> diag(0.54/7, 0.54/7, 0)
                        = diag(0.07714285714285715, ..., 0)
          eigenvalues ascending (0, 0.54/7, 0.54/7); evals[0] >= 0 and
          evals[2] >= 1e-12, so the voxel is kept (:305-310)
          min_acceptable = max(1e-12, 0.01 * 0.54/7)
                         = 7.714285714285715e-4        (:315)
          inflated cov   = diag(0.54/7, 0.54/7, 0.0054/7)
          icov           = diag(7/0.54, 7/0.54, 7/0.0054)
                         = diag(12.962962962962962, ..., 1296.2962962962963)
          max |icov| = 1296.3 < 1e12 -> stable (:337)
        """
        c = np.array([0.5, 0.5, 0.5])
        offs = np.array(
            [
                [0.3, 0.0, 0.0], [-0.3, 0.0, 0.0],
                [0.0, 0.3, 0.0], [0.0, -0.3, 0.0],
                [0.3, 0.3, 0.0], [-0.3, -0.3, 0.0],
                [0.3, -0.3, 0.0], [-0.3, 0.3, 0.0],
            ]
        )
        pts = jnp.asarray(c + offs)
        mask = jnp.ones(8, bool)
        stats = gaussian_map.stats_from_points(
            pts, mask, jnp.zeros(3, pts.dtype), jnp.asarray(1.0, pts.dtype), 4
        )
        gmap = gaussian_map.finalize(stats, min_points_per_voxel=3)
        v = int(jnp.argmax(gmap.valid))
        assert bool(gmap.valid[v])
        np.testing.assert_allclose(np.asarray(gmap.mean[v]), c, atol=1e-12)
        cov = np.asarray(gmap.cov[v])
        icov = np.asarray(gmap.icov[v])
        lit_cov = np.diag([0.07714285714285715, 0.07714285714285715,
                           7.714285714285715e-4])
        lit_icov = np.diag([12.962962962962962, 12.962962962962962,
                            1296.2962962962963])
        np.testing.assert_allclose(cov, lit_cov, atol=1e-9)
        np.testing.assert_allclose(icov, lit_icov, rtol=1e-7, atol=1e-8)
        # inflated eigenvalue set, ascending (:315-331)
        np.testing.assert_allclose(
            np.asarray(gmap.evals[v]),
            [7.714285714285715e-4, 0.07714285714285715, 0.07714285714285715],
            rtol=1e-7,
        )


class TestObjectiveVignette:
    def test_single_pair_score_and_gradient_literals(self):
        """One point against one voxel Gaussian at the identity pose.

        At identity with zero rotation, the reference's Euler-angle Jacobian
        tables coincide with the SE(3)-tangent Jacobian for the translation
        block (dx/dt = I), so the parameterizations agree exactly. With
        xrel = x - mu = (0.2, -0.1, 0.3) and Sigma^-1 = diag(4, 2, 1)
        (svn_ndt_impl.hpp score/updateDerivatives accumulation):
          mahal  = 4*.04 + 2*.01 + 1*.09      = 0.27
          e      = exp(-d2/2 * 0.27)
          score  = -d1 * e                    = 2.0912979844813946
          grad_t = d1*d2*e * Sigma^-1 xrel
                 = (-0.7246314134152556,
                     0.1811578533538139,
                    -0.2717367800307208)
        """
        d1, d2, _ = gauss_constants(1.0, 0.55)
        res = jnp.asarray(1.0, jnp.float64)
        # hand-construct a one-voxel map: mean at the center of cell (5,5,5)
        cap = 4
        mu = np.array([5.5, 5.5, 5.5])
        icov_lit = np.diag([4.0, 2.0, 1.0])
        keys = np.full(cap, voxel.INVALID_KEY, np.int32)
        key0 = int(voxel.pack(jnp.asarray([[5, 5, 5]], jnp.int32))[0])
        keys[0] = key0
        gmap = gaussian_map.GaussianMap(
            keys=jnp.asarray(keys),
            count=jnp.asarray([8, 0, 0, 0], jnp.int32),
            mean=jnp.asarray(np.stack([mu] + [np.zeros(3)] * 3)),
            cov=jnp.asarray(np.stack([np.linalg.inv(icov_lit)] + [np.eye(3)] * 3)),
            icov=jnp.asarray(np.stack([icov_lit] + [np.zeros((3, 3))] * 3)),
            evals=jnp.zeros((cap, 3)),
            evecs=jnp.broadcast_to(jnp.eye(3), (cap, 3, 3)),
            valid=jnp.asarray([True, False, False, False]),
            origin=jnp.zeros(3, jnp.float64),
            resolution=res,
        )
        point = jnp.asarray([[5.7, 5.4, 5.8]])  # mu + (0.2, -0.1, 0.3)
        obj = score_grad_hess(
            point, jnp.ones(1, bool), se3.identity(dtype=jnp.float64), gmap,
            d1, d2, offsets=voxel.DIRECT1_OFFSETS, hess_lambda=0.0,
        )
        assert float(obj.score) == pytest.approx(2.0912979844813946, abs=1e-12)
        np.testing.assert_allclose(
            np.asarray(obj.grad[3:6]),
            [-0.7246314134152556, 0.1811578533538139, -0.2717367800307208],
            atol=1e-12,
        )
        assert int(obj.n_contrib) == 1
