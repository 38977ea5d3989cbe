"""Parity tests for the sort/segment-sum Gaussian voxel map vs the numpy oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from slamtpu.mapping import gaussian_map, voxel
from tests.oracles import oracle_build_map

RNG = np.random.default_rng(7)


def make_cloud(n=5000):
    centers = RNG.uniform(0, 20, size=(40, 3))
    pts = (centers[RNG.integers(0, 40, n)] + RNG.normal(scale=0.3, size=(n, 3))).astype(
        np.float64
    )
    mask = np.ones(n, dtype=bool)
    mask[-100:] = False  # padding tail
    pts[-50:] = np.nan  # some NaNs inside padding and some real NaNs
    mask[-75:-50] = True
    pts[-75:-60] = np.inf
    return pts, mask


class TestVoxelKeys:
    def test_pack_unpack(self):
        coords = RNG.integers(0, voxel.GRID_DIM, size=(1000, 3)).astype(np.int32)
        keys = voxel.pack(jnp.asarray(coords))
        back = np.asarray(voxel.unpack(keys))
        np.testing.assert_array_equal(back, coords)

    def test_pack_ordering_lexicographic(self):
        coords = RNG.integers(0, voxel.GRID_DIM, size=(500, 3)).astype(np.int32)
        keys = np.asarray(voxel.pack(jnp.asarray(coords)))
        order_keys = np.argsort(keys, kind="stable")
        order_lex = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
        np.testing.assert_array_equal(np.sort(keys[order_keys]), np.sort(keys[order_lex]))

    def test_out_of_range_invalid(self):
        coords = jnp.asarray([[-1, 0, 0], [0, voxel.GRID_DIM, 0], [5, 5, 5]], jnp.int32)
        keys = np.asarray(voxel.pack(coords))
        assert keys[0] == voxel.INVALID_KEY
        assert keys[1] == voxel.INVALID_KEY
        assert keys[2] != voxel.INVALID_KEY

    def test_lookup(self):
        keys = jnp.asarray(np.sort(RNG.choice(10**6, size=64, replace=False)).astype(np.int32))
        slot, found = voxel.lookup(keys, keys)
        np.testing.assert_array_equal(np.asarray(slot), np.arange(64))
        assert np.asarray(found).all()
        missing = jnp.asarray([10**6 + 5, voxel.INVALID_KEY], jnp.int32)
        _, found2 = voxel.lookup(keys, missing)
        assert not np.asarray(found2).any()


class TestGaussianMap:
    def test_parity_vs_oracle(self):
        pts, mask = make_cloud()
        res = 1.0
        origin = np.floor(pts[mask & np.isfinite(pts).all(-1)].min(0)) - 4
        gmap = jax.jit(
            gaussian_map.build_map, static_argnames=("capacity", "min_points_per_voxel")
        )(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin), res, capacity=4096)
        omap = oracle_build_map(pts, mask, origin, res)

        keys = np.asarray(gmap.keys)
        valid = np.asarray(gmap.valid)
        # every oracle voxel must be present, valid, and match
        mean = np.asarray(gmap.mean)
        cov = np.asarray(gmap.cov)
        icov = np.asarray(gmap.icov)
        count = np.asarray(gmap.count)
        n_checked = 0
        for c, (n_o, mean_o, cov_o, icov_o) in omap.items():
            key = (c[0] * voxel.GRID_DIM + c[1]) * voxel.GRID_DIM + c[2]
            i = np.searchsorted(keys, key)
            assert keys[i] == key, f"voxel {c} missing"
            assert valid[i], f"voxel {c} invalid"
            assert count[i] == n_o
            np.testing.assert_allclose(mean[i], mean_o, atol=1e-9)
            np.testing.assert_allclose(cov[i], cov_o, atol=1e-9)
            np.testing.assert_allclose(icov[i], icov_o, rtol=1e-6, atol=1e-8)
            n_checked += 1
        assert n_checked > 20
        # no spurious valid voxels
        oracle_keys = {
            (c[0] * voxel.GRID_DIM + c[1]) * voxel.GRID_DIM + c[2] for c in omap
        }
        for i in np.where(valid)[0]:
            assert int(keys[i]) in oracle_keys

    def test_keys_sorted_with_padding_at_end(self):
        pts, mask = make_cloud(2000)
        origin = np.zeros(3) - 50
        gmap = gaussian_map.build_map(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin), 1.0, capacity=2048
        )
        keys = np.asarray(gmap.keys)
        assert (np.diff(keys.astype(np.int64)) >= 0).all()
        occupied = keys != voxel.INVALID_KEY
        assert not occupied[~occupied.argmin() :].any() or occupied.all() or True
        # all occupied slots come before all padding slots
        first_pad = np.argmax(keys == voxel.INVALID_KEY) if (keys == voxel.INVALID_KEY).any() else len(keys)
        assert (keys[:first_pad] != voxel.INVALID_KEY).all()
        assert (keys[first_pad:] == voxel.INVALID_KEY).all()

    def test_merge_stats_equals_joint_build(self):
        pts, mask = make_cloud(3000)
        origin = jnp.asarray(np.zeros(3) - 50.0)
        res = jnp.asarray(1.0)
        a = gaussian_map.stats_from_points(
            jnp.asarray(pts[:1500]), jnp.asarray(mask[:1500]), origin, res, 2048
        )
        b = gaussian_map.stats_from_points(
            jnp.asarray(pts[1500:]), jnp.asarray(mask[1500:]), origin, res, 2048
        )
        merged = gaussian_map.merge_stats(a, b, 2048)
        joint = gaussian_map.stats_from_points(
            jnp.asarray(pts), jnp.asarray(mask), origin, res, 2048
        )
        np.testing.assert_array_equal(np.asarray(merged.keys), np.asarray(joint.keys))
        np.testing.assert_array_equal(np.asarray(merged.n), np.asarray(joint.n))
        np.testing.assert_allclose(np.asarray(merged.sx), np.asarray(joint.sx), atol=1e-9)
        np.testing.assert_allclose(np.asarray(merged.sxx), np.asarray(joint.sxx), atol=1e-8)

    def test_far_from_origin_float32_covariance(self):
        """Voxel covariance must survive float32 accumulation kilometers from
        the world origin: absolute-coordinate sums cancel catastrophically
        (|p|^2 ~ 5e7 vs cov ~ 0.08), origin-relative sums do not."""
        c = np.float32([5000.5, 5000.5, 100.5])
        offs = np.array(
            [
                [0.3, 0.0, 0.0], [-0.3, 0.0, 0.0],
                [0.0, 0.3, 0.0], [0.0, -0.3, 0.0],
                [0.3, 0.3, 0.0], [-0.3, -0.3, 0.0],
                [0.3, -0.3, 0.0], [-0.3, 0.3, 0.0],
            ],
            np.float32,
        )
        pts = jnp.asarray(c + offs)  # float32 end-to-end
        origin = jnp.asarray(np.floor(c) - 2.0, jnp.float32)
        stats = gaussian_map.stats_from_points(
            pts, jnp.ones(8, bool), origin, jnp.asarray(1.0, jnp.float32), 4
        )
        gmap = gaussian_map.finalize(stats, min_points_per_voxel=3)
        v = int(jnp.argmax(gmap.valid))
        assert bool(gmap.valid[v])
        np.testing.assert_allclose(np.asarray(gmap.mean[v]), c, atol=1e-3)
        lit = np.diag([0.54 / 7, 0.54 / 7, 0.01 * 0.54 / 7])
        np.testing.assert_allclose(np.asarray(gmap.cov[v]), lit, atol=2e-4)

    def test_far_from_map_origin_normal_eigenvalue(self):
        """The surface-normal eigenvalue (~1e-4 m^2 for a 2 cm-thick wall)
        must survive float32 stats for voxels ~500 m from the MAP origin —
        the far half of the 1024 m Berlin grid. Origin-relative sums lose it
        (|rel|^2 ~ 2.5e5 m^2 quantizes at ~1.5e-2 m^2, 40x the eigenvalue);
        voxel-corner-relative sums keep |rel| < resolution."""
        rng = np.random.default_rng(3)
        n = 400
        c = np.array([500.5, 500.5, 30.5])
        pts64 = c + np.stack(
            [
                rng.uniform(-0.45, 0.45, n),
                rng.uniform(-0.45, 0.45, n),
                # thin wall, normal = z: sigma chosen so the true smallest
                # eigenvalue (1.6e-3 m^2) clears the 0.01*lambda_max
                # inflation floor (~7e-4) yet stays far below the ~1.5e-2
                # m^2 rounding noise of origin-relative f32 accumulation
                rng.normal(scale=0.04, size=n),
            ],
            axis=1,
        )
        pts = jnp.asarray(pts64, jnp.float32)
        origin = jnp.zeros(3, jnp.float32)
        stats = gaussian_map.stats_from_points(
            pts, jnp.ones(n, bool), origin, jnp.asarray(1.0, jnp.float32), 8
        )
        gmap = gaussian_map.finalize(stats, min_points_per_voxel=3)
        v = int(jnp.argmax(gmap.valid))
        assert bool(gmap.valid[v])
        cov64 = np.cov(pts64.T, ddof=1)
        ev_true = np.linalg.eigvalsh(cov64)
        ev = np.sort(np.asarray(gmap.evals[v], np.float64))
        np.testing.assert_allclose(
            np.asarray(gmap.mean[v], np.float64), pts64.mean(0), atol=1e-3
        )
        # smallest (normal-direction) eigenvalue accurate to 20%
        np.testing.assert_allclose(ev[0], ev_true[0], rtol=0.2)

    def test_overflow_reported(self):
        pts = RNG.uniform(0, 100, size=(4000, 3))
        mask = np.ones(4000, bool)
        stats = gaussian_map.stats_from_points(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(np.zeros(3) - 1.0), jnp.asarray(1.0), 64
        )
        assert int(stats.overflow) > 0

    def test_ins_map_counts_out_of_range_points(self):
        """Points beyond the packed-key extent must be counted, not silently
        dropped (long-trajectory mapping safeguard)."""
        from slamtpu.apps.ins_map import _accumulate
        from slamtpu.core import se3

        origin = jnp.asarray(np.zeros(3), jnp.float32)
        base = gaussian_map.stats_from_points(
            jnp.zeros((1, 3), jnp.float32), jnp.zeros(1, bool),
            origin, jnp.asarray(1.0, jnp.float32), 256,
        )
        n = 64
        pts = np.zeros((n, 3), np.float32)
        pts[: n // 2] = RNG.uniform(5, 50, size=(n // 2, 3))  # in range
        pts[n // 2 :] = RNG.uniform(5000, 6000, size=(n // 2, 3))  # way out
        stats, oor = _accumulate(
            base, jnp.asarray(pts), jnp.ones(n, bool),
            se3.identity(dtype=jnp.float32), 256,
        )
        assert int(oor) == n // 2
        assert int(jnp.sum(stats.n)) == n // 2


class TestRecenterOrigin:
    def test_no_shift_inside_threshold(self):
        origin = jnp.asarray([-512.0, -512.0, -512.0])
        new, shifted = gaussian_map.recenter_origin(origin, np.zeros(3), 1.0)
        assert not shifted
        np.testing.assert_array_equal(np.asarray(new), np.asarray(origin))

    def test_shift_beyond_threshold_and_map_still_works(self):
        origin = jnp.asarray([-512.0, -512.0, -512.0])
        pos = np.array([400.0, 0.0, 0.0])  # beyond 0.5 * 512 from center
        new, shifted = gaussian_map.recenter_origin(origin, pos, 1.0)
        assert shifted
        # new origin centers the grid on the position (snapped to the lattice)
        center = np.asarray(new) + 512.0
        assert np.max(np.abs(center - pos)) < 1.0
        # a map built with the shifted origin still covers points near pos
        pts = jnp.asarray(pos + RNG.normal(0, 5.0, (2000, 3)))
        gmap = gaussian_map.build_map(
            pts, jnp.ones(2000, bool), new, 1.0, capacity=2048, min_points_per_voxel=3
        )
        assert int(gmap.num_valid()) > 5


class TestDownsample:
    def test_voxel_downsample_matches_oracle_centroids(self):
        from slamtpu.mapping import voxel_downsample

        pts, mask = make_cloud(3000)
        origin = np.zeros(3) - 50.0
        cents, out_mask, ovf = jax.jit(
            voxel_downsample, static_argnames=("capacity",)
        )(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin), 1.0, capacity=2048)
        cents, out_mask = np.asarray(cents), np.asarray(out_mask)
        assert int(ovf) == 0
        # capacity pressure must be counted, not silent
        _, _, ovf2 = jax.jit(
            voxel_downsample, static_argnames=("capacity",)
        )(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin), 1.0, capacity=16)
        assert int(ovf2) > 0
        # oracle: group by voxel, mean
        ok = mask & np.isfinite(pts).all(-1)
        coords = np.floor((pts[ok] - origin) / 1.0).astype(np.int64)
        groups = {}
        for c, p in zip(map(tuple, coords), pts[ok]):
            groups.setdefault(c, []).append(p)
        assert out_mask.sum() == len(groups)
        got = {tuple(np.floor((c - origin) / 1.0).astype(np.int64)): c for c in cents[out_mask]}
        for c, plist in groups.items():
            assert c in got, c
            np.testing.assert_allclose(got[c], np.mean(plist, axis=0), atol=1e-9)

    def test_axis_crop(self):
        from slamtpu.mapping import axis_crop

        pts = jnp.asarray(RNG.uniform(-10, 10, (500, 3)))
        mask = jnp.ones(500, bool)
        out = np.asarray(axis_crop(pts, mask, 2, -1.0, 1.0))
        z = np.asarray(pts[:, 2])
        np.testing.assert_array_equal(out, (z >= -1.0) & (z <= 1.0))
