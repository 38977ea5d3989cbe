"""Failure-softening logic: GPS-denial trust-gain scheduling and
deviation-gated pose blending.

Faithful ports of the reference's application-level robustness
(/root/reference/run/pipeline.cpp:455-462, 570-592, 637-665 and the 9-dof
variant run/pipeline_ligo_tc.cpp:272-282, 465-506), expressed as pure
functions usable inside jitted step loops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3, so3
from ..core.se3 import Pose3


class TrustGainState(NamedTuple):
    was_denied: jax.Array  # () bool
    trust: jax.Array  # () in [0, 1]


def trust_gain_init(dtype=jnp.float64) -> TrustGainState:
    return TrustGainState(jnp.asarray(False), jnp.asarray(1.0, dtype))


def trust_gain_update(
    state: TrustGainState,
    ins_sigma_norm: jax.Array,
    denial_threshold: float = 0.1,  # meters of INS sigma-norm (pipeline.cpp:637)
    recovery_rate: float = 0.005,  # trust regained per keyframe (":460")
    denied_scale: float = 1e2,  # sigma scaling while denied (":458")
):
    """Returns (new_state, sigma_scale in [1, denied_scale]).

    While GPS-denied, INS prior sigmas are inflated by ``denied_scale``; on
    recovery, trust resets to 0 and ramps back linearly so the scaling
    interpolates from denied_scale down to 1 over 1/recovery_rate keyframes
    (pipeline.cpp:637-655)."""
    available = ins_sigma_norm < denial_threshold
    trust = jnp.where(available & state.was_denied, 0.0, state.trust)
    trust = jnp.where(available, jnp.minimum(1.0, trust + recovery_rate), trust)
    scale = jnp.where(available, denied_scale + trust * (1.0 - denied_scale), denied_scale)
    return TrustGainState(~available, trust), scale


def trust_gain_init_np():
    return (False, 1.0)


def trust_gain_update_np(
    state,
    ins_sigma_norm: float,
    denial_threshold: float = 0.1,
    recovery_rate: float = 0.005,
    denied_scale: float = 1e2,
):
    """Host-scalar twin of trust_gain_update (state = (was_denied, trust));
    the per-keyframe apps run it on the host to avoid eager device dispatch."""
    was_denied, trust = state
    available = float(ins_sigma_norm) < denial_threshold
    if available and was_denied:
        trust = 0.0
    if available:
        trust = min(1.0, trust + recovery_rate)
        scale = denied_scale + trust * (1.0 - denied_scale)
    else:
        scale = denied_scale
    return (not available, trust), scale


def deviation_gated_blend(
    pose_pred: Pose3,
    pose_meas: Pose3,
    max_trans_deviation: float = 1.0,  # m (pipeline.cpp:454)
    max_rot_deviation: float = 0.1,  # rad (":455")
):
    """Blend a registration result toward a constant-velocity prediction when
    it deviates too much (pipeline.cpp:570-592).

    Trust weight w = min(max(0, 1 - |dt|/maxT), max(0, 1 - |dr|/maxR));
    blending is linear in the *global* Logmap coordinates, exactly like the
    reference (which interpolates Logmap(pred) and Logmap(meas) — a chordal,
    not geodesic, blend). Returns (blended_pose, trust_weight)."""
    dev = se3.between(pose_pred, pose_meas)
    trans_err = jnp.linalg.norm(dev.trans)
    rot_err = jnp.linalg.norm(so3.log(dev.rot))
    w_trans = jnp.maximum(0.0, 1.0 - trans_err / max_trans_deviation)
    w_rot = jnp.maximum(0.0, 1.0 - rot_err / max_rot_deviation)
    w = jnp.minimum(w_trans, w_rot)
    xi_pred = se3.logmap(pose_pred)
    xi_meas = se3.logmap(pose_meas)
    blended = se3.expmap(xi_pred + w * (xi_meas - xi_pred))
    return blended, w


def constant_velocity_predict(prev: Pose3, curr: Pose3) -> Pose3:
    """Next-pose prediction: curr * (prev^-1 curr)
    (pipeline.cpp:763-770)."""
    return se3.compose(curr, se3.between(prev, curr))
