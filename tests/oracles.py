"""Pure-numpy float64 oracles replicating the reference NDT math.

These implement exactly the accumulation/finalization/scoring semantics of
/root/reference/extern/svn_ndt/include/voxel_grid_covariance_impl.hpp:163-343
and svn_ndt_impl.hpp:400-668 (with the SE(3)-tangent Jacobian used by the new
framework), as independent dict-based scalar code — no JAX.
"""
import numpy as np

GRID_DIM = 1024
DIRECT7 = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]


def hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64)


def oracle_gauss_constants(resolution, outlier_ratio):
    c1 = max(10.0 * (1.0 - outlier_ratio), 1e-9)
    c2 = max(outlier_ratio / resolution**3, 1e-9)
    d3 = -np.log(c2)
    d1 = -np.log(c1 + c2) - d3
    d2 = -2.0 * np.log((-np.log(c1 * np.exp(-0.5) + c2) - d3) / d1)
    return d1, d2, d3


def oracle_build_map(points, mask, origin, res, min_points=6, mult=0.01):
    """dict voxel-coords -> (n, mean, cov, icov)."""
    cells = {}
    for ok, p in zip(mask, points):
        if not ok or not np.isfinite(p).all():
            continue
        c = tuple(int(v) for v in np.floor((p - origin) / res))
        if any(ci < 0 or ci >= GRID_DIM for ci in c):
            continue
        cells.setdefault(c, []).append(np.asarray(p, np.float64))
    out = {}
    for c, pts in cells.items():
        n = len(pts)
        if n < max(min_points, 3):
            continue
        pts = np.stack(pts)
        mean = pts.mean(axis=0)
        # single-pass formula with Bessel correction, as the reference
        cov = (pts.T @ pts / n - np.outer(mean, mean)) * (n / (n - 1.0))
        ev, evec = np.linalg.eigh(cov)
        if ev[0] < 0 or ev[1] < 0 or ev[2] < 1e-12:
            continue
        floor = max(1e-12, ev[2] * mult)
        ev = np.maximum(ev, floor)
        cov = evec @ np.diag(ev) @ evec.T
        icov = np.linalg.inv(cov)
        if not np.isfinite(icov).all() or np.abs(icov).max() > 1e12:
            continue
        out[c] = (n, mean, cov, icov)
    return out


def oracle_ndt(points, mask, R, t, omap, origin, res, d1, d2, neighbors=DIRECT7,
               hess_lambda=1e-6):
    """Score/grad/GN-Hessian with the SE(3)-tangent Jacobian J = [-R hat(x) | R]."""
    score = 0.0
    g = np.zeros(6)
    H = np.zeros((6, 6))
    for ok, x in zip(mask, points):
        if not ok:
            continue
        x = np.asarray(x, np.float64)
        tp = R @ x + t
        base = np.floor((tp - origin) / res).astype(int)
        J = np.zeros((3, 6))
        J[:, :3] = -R @ hat(x)
        J[:, 3:] = R
        for off in neighbors:
            cc = tuple(base + np.asarray(off))
            if cc not in omap:
                continue
            _, mean, _, icov = omap[cc]
            xr = tp - mean
            mahal = max(float(xr @ icov @ xr), 0.0)
            earg = 0.5 * d2 * mahal
            if earg > 50.0:
                continue
            e = np.exp(-earg)
            score += -d1 * e
            f = d1 * d2 * e
            if abs(f) < 1e-15:
                continue
            g += f * (J.T @ (icov @ xr))
            H += f * (J.T @ icov @ J)
    return score, g, H + hess_lambda * np.eye(6)


def two_plane_cloud(extent=10.0, pitch=0.15):
    """Synthetic fixture like the reference test
    (/root/reference/extern/svn_ndt/test/test_svn_ndt.cpp:44-131): two
    perpendicular planes sampled on a regular grid."""
    ax = np.arange(0.0, extent, pitch)
    g1, g2 = np.meshgrid(ax, ax, indexing="ij")
    plane_xy = np.stack([g1.ravel(), g2.ravel(), np.zeros(g1.size)], axis=-1)
    plane_yz = np.stack([np.zeros(g1.size), g1.ravel(), g2.ravel()], axis=-1)
    return np.concatenate([plane_xy, plane_yz]).astype(np.float64)
