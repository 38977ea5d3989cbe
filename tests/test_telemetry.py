"""Per-stage registration telemetry: the named scopes that decompose a
keyframe in a ``--profile`` trace (the analog of the reference's per-SVN-
iteration S1/S2/S3 stage prints, svn_ndt_impl.hpp:880-891) must be present
in the lowered program's op metadata — otherwise a trace shows one opaque
fused computation."""
import jax
import jax.numpy as jnp
import numpy as np

from slamtpu.core import se3
from slamtpu.ndt import SvnConfig, svn_align_reg
from slamtpu.ndt.regmap import empty_regmap

GRID = (8, 8, 4)


def _lowered_text(fn, *args, **kw):
    low = jax.jit(fn).lower(*args, **kw)
    try:
        return low.as_text(debug_info=True)
    except TypeError:  # older jax: debug info always included
        return low.as_text()


def test_svn_loop_stage_scopes_in_lowered_program():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)), jnp.float32)
    mask = jnp.ones((64,), bool)
    rm = empty_regmap(64, GRID)
    cfg = SvnConfig(num_particles=4, max_iterations=2, polish_iters=0)

    def run(pts, mask, rm, key):
        return svn_align_reg(
            pts, mask, rm, se3.identity(dtype=jnp.float32), key, cfg, GRID
        )

    txt = _lowered_text(run, pts, mask, rm, jax.random.PRNGKey(0))
    for scope in (
        "svn_gather", "svn_particle_eval", "svn_stein_update", "svn_retract",
        "svn_final_score", "svn_posterior",
    ):
        assert scope in txt, f"missing stage scope {scope}"


def test_lo_svn_step_stage_scopes_in_lowered_program():
    from slamtpu.apps.lo_svn import _lo_svn_step

    K, N = 2, 64
    kf_points = jnp.zeros((K, N, 3), jnp.float32)
    kf_mask = jnp.zeros((K, N), bool)
    new_points = jnp.zeros((N, 3), jnp.float32)
    new_mask = jnp.ones((N,), bool)
    flat = jnp.zeros((17,), jnp.float32)
    rm = empty_regmap(64, GRID, with_aux=True)
    cfg = SvnConfig(
        num_particles=4, max_iterations=2, polish_iters=1,
        polish_objective="gicp_aniso",
    )
    low = jax.jit(
        _lo_svn_step,
        static_argnames=(
            "svn_cfg", "capacity", "min_points", "grid_shape", "publish_svn",
            "scan_grid",
        ),
    ).lower(
        kf_points, kf_mask, new_points, new_mask, flat, jnp.int32(0),
        jax.random.PRNGKey(0), rm, svn_cfg=cfg, capacity=64, min_points=3,
        grid_shape=GRID, publish_svn=True, scan_grid=(8, 8),
    )
    try:
        txt = low.as_text(debug_info=True)
    except TypeError:
        txt = low.as_text()
    for scope in (
        "map_rebuild", "src_covariances", "svn_gather", "svn_polish",
        "ring_insert",
    ):
        assert scope in txt, f"missing stage scope {scope}"
