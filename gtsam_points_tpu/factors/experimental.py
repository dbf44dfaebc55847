"""Experimental factors: Sim(3)<->SE(3) coupling and trajectory-scale
alignment (reference: include/gtsam_points/factors/experimental/
between_sim3_se3_factor.hpp — a NoiseModelFactor2<Similarity3, Pose3> whose
error is Logmap(scaled_transform(sim3)^-1 * pose)).

TPU-native re-design: Sim(3) state is an (SE(3) matrix, log-scale) pair
retracted multiplicatively; errors and Jacobians come from forward-mode AD of
the residual, and the whole mixed-variable Gauss-Newton solve is one jitted
fixed-iteration loop (no dynamic convergence branching).

The reference's other experimental factors are covered by the mainline
modules here: expression_icp_factor.hpp -> factors/icp.py (AD already gives
the expression-graph Jacobians), continuous_time_icp_factor.hpp ->
factors/ct_icp.py, intensity_gradients_ivox_.hpp ->
factors/colored.py:estimate_intensity_gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.utils import se3


class Sim3(NamedTuple):
    """Similarity transform: pose [4,4] SE(3) + scalar scale (stored as is).

    Mirrors gtsam::Similarity3 (rotation, translation, scale). The matrix
    form is [[s*R, t], [0, 1]] via :func:`sim3_matrix`.
    """

    pose: jax.Array  # [4,4] SE(3) (unit-scale rotation + translation)
    scale: jax.Array  # () float32


def sim3_identity() -> Sim3:
    return Sim3(pose=jnp.eye(4, dtype=jnp.float32), scale=jnp.float32(1.0))


def sim3_matrix(s: Sim3) -> jax.Array:
    """[[s*R, t], [0,1]] — acts on points as s*R*p + t."""
    m = s.pose.at[:3, :3].multiply(s.scale)
    return m


def sim3_apply(s: Sim3, pts: jax.Array) -> jax.Array:
    return pts @ (s.scale * s.pose[:3, :3]).T + s.pose[:3, 3]


def sim3_retract(s: Sim3, xi7: jax.Array) -> Sim3:
    """Retraction: pose <- pose * Expmap(xi[:6]); scale <- scale * exp(xi[6])."""
    return Sim3(pose=s.pose @ se3.se3_exp(xi7[:6]), scale=s.scale * jnp.exp(xi7[6]))


def scaled_transform(s: Sim3) -> jax.Array:
    """SE(3) 'shadow' of a Sim3: Pose3(R, s*t) — the reference's
    scaled_transform (between_sim3_se3_factor.hpp:13-22)."""
    return s.pose.at[:3, 3].multiply(s.scale)


def between_sim3_se3_error(s: Sim3, T: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """r = Log(scaled_transform(s)^-1 * T), optionally weight-scaled ([6])."""
    r = se3.se3_log(se3.se3_inverse(scaled_transform(s)) @ T)
    if weights is not None:
        r = jnp.sqrt(weights) * r
    return r


def align_trajectories_sim3(
    poses_a: jax.Array,
    poses_b: jax.Array,
    weights: jax.Array | None = None,
    iterations: int = 20,
    damping: float = 1e-6,
) -> Sim3:
    """Estimate the Sim3 S minimizing sum_i |Log(scaled(S * A_i)^-1 B_i)|^2 —
    the classic scale-drift / monocular-to-metric trajectory alignment built
    from the BetweenSim3SE3 residual. Jacobians by AD; fixed-iteration jitted
    Gauss-Newton (7x7 solve).

    poses_a, poses_b: [P,4,4] SE(3). Returns Sim3 mapping frame a -> frame b.
    """
    if weights is None:
        weights = jnp.ones((6,), jnp.float32)

    def residuals(xi7, s):
        s2 = sim3_retract(s, xi7)

        def per_pose(Ta, Tb):
            pred = Sim3(pose=s2.pose @ Ta, scale=s2.scale)
            return between_sim3_se3_error(pred, Tb, weights)

        return jax.vmap(per_pose)(poses_a, poses_b).reshape(-1)

    def body(s, _):
        zero = jnp.zeros((7,), jnp.float32)
        r0 = residuals(zero, s)
        J = jax.jacfwd(residuals)(zero, s)
        A = J.T @ J + damping * jnp.eye(7, dtype=jnp.float32)
        b = -(J.T @ r0)
        xi = jnp.linalg.solve(A, b)
        return sim3_retract(s, xi), jnp.sum(r0 * r0)

    s, errs = jax.lax.scan(body, sim3_identity(), None, length=iterations)
    return s
