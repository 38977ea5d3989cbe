"""Headline benchmark: scan-to-map NDT registrations/sec at 128k pts/scan.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 50 registrations/s on one v5p chip.
Each registration = a full Newton P2D-NDT alignment (DIRECT7, 1.0 m voxels,
30 max iterations) of a 128k-point scan against a prebuilt Gaussian voxel
map — the reference hot path (ndt_omp align, run/pipeline.cpp:558-563).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

N_POINTS = 128 * 1024
RESOLUTION = 1.0
MAP_CAPACITY = 1 << 16
MAX_ITERS = 30
BASELINE_REG_PER_S = 50.0


def main():
    import jax
    import jax.numpy as jnp

    from slamtpu.core import se3
    from slamtpu.mapping import gaussian_map
    from slamtpu.ndt import NewtonConfig, build_regmap, newton_align_reg

    rng = np.random.default_rng(42)
    # Structured synthetic world (ground + walls + clutter), ~60 m extent —
    # matches the Berlin operating point (128 k pts after decode, 1 m voxels).
    n_g = N_POINTS // 2
    ground = np.stack(
        [rng.uniform(0, 80, n_g), rng.uniform(0, 80, n_g), rng.normal(0, 0.04, n_g)], -1
    )
    n_w = N_POINTS // 4
    walls = np.stack(
        [rng.uniform(0, 80, n_w), rng.normal(40, 0.06, n_w), rng.uniform(0, 8, n_w)], -1
    )
    flip = rng.random(n_w) < 0.5
    walls[flip] = walls[flip][:, [1, 0, 2]]
    n_c = N_POINTS - n_g - n_w
    centers = rng.uniform(0, 80, size=(64, 3)) * np.array([1, 1, 0.1])
    clutter = centers[rng.integers(0, 64, n_c)] + rng.normal(0, 0.5, (n_c, 3))
    world = np.concatenate([ground, walls, clutter]).astype(np.float32)

    pts = jnp.asarray(world)
    mask = jnp.ones(N_POINTS, bool)
    origin = jnp.asarray([-32.0, -32.0, -32.0], jnp.float32)
    gmap = jax.jit(
        gaussian_map.build_map, static_argnames=("capacity", "min_points_per_voxel")
    )(pts, mask, origin, RESOLUTION, capacity=MAP_CAPACITY)
    regmap = build_regmap(gmap, grid_shape=(192, 192, 48))
    jax.block_until_ready(regmap.packed)

    # source scan: world resampled + sensor noise, offset by a realistic
    # inter-scan motion; registration must run the full Newton pipeline
    src = jnp.asarray(world + rng.normal(0, 0.01, world.shape).astype(np.float32))
    true_xi = jnp.asarray([0.004, -0.006, 0.02, 0.6, -0.4, 0.08], jnp.float32)
    gt = se3.expmap(true_xi)
    src_body = se3.transform_points(se3.inverse(gt), src)

    cfg = NewtonConfig(
        resolution=RESOLUTION, max_iterations=MAX_ITERS, trans_eps=1e-4
    )
    _align = jax.jit(newton_align_reg, static_argnames=("cfg", "grid_shape"))

    def align(src, msk, rmap, init, cfg):
        return _align(src, msk, rmap, init, cfg, (192, 192, 48))

    res = align(src_body, mask, regmap, se3.identity(dtype=jnp.float32), cfg)
    jax.block_until_ready(res.pose.trans)
    err = np.asarray(se3.local(gt, res.pose))
    trans_err = float(np.linalg.norm(err[3:]))
    rot_err = float(np.linalg.norm(err[:3]))
    assert trans_err < 0.05 and rot_err < 0.035, (
        f"benchmark registration inaccurate: trans {trans_err}, rot {rot_err}"
    )

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = align(src_body, mask, regmap, se3.identity(dtype=jnp.float32), cfg)
    jax.block_until_ready(res.pose.trans)
    dt = (time.perf_counter() - t0) / n_rep
    reg_per_s = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "scan-to-map NDT registrations/sec (128k pts, 1.0 m voxels, DIRECT7, Newton<=30 iters)",
                "value": round(reg_per_s, 3),
                "unit": "registrations/s",
                "vs_baseline": round(reg_per_s / BASELINE_REG_PER_S, 3),
                "detail": {
                    "backend": jax.default_backend(),
                    "iters": int(res.iterations),
                    "trans_err_m": round(trans_err, 5),
                    "rot_err_rad": round(rot_err, 5),
                    "ms_per_registration": round(dt * 1e3, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
