"""Pose-space factors: prior, between (relative pose), linear damping.

Reference analogues: gtsam::PriorFactor/BetweenFactor (used throughout the
reference tests for gauge fixing) and LinearDampingFactor
(include/gtsam_points/factors/linear_damping_factor.hpp:16).
Residuals are Logmap-based with AD Jacobians.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import register_factor
from gtsam_points_tpu.factors.linearized import Linearized
from gtsam_points_tpu.utils import se3


def _zero6():
    return jnp.zeros((6, 6), dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class PriorFactor:
    """E = || Log(prior⁻¹ T) ||²_W, W diagonal [6] in (omega, v) order."""

    prior: jax.Array  # [4, 4]
    weights: jax.Array  # [6]
    key: int

    @property
    def keys(self):
        return (self.key,)

    def _residual(self, T):
        return se3.se3_log(se3.se3_inverse(self.prior) @ T)

    def linearize(self, poses: jax.Array) -> Linearized:
        T = poses[self.key]
        r0 = self._residual(T)
        J = jax.jacfwd(lambda xi: self._residual(T @ se3.se3_exp(xi)))(jnp.zeros((6,), jnp.float32))
        WJ = J * self.weights[:, None]
        H = J.T @ WJ
        b = -(J.T @ (self.weights * r0))
        err = jnp.sum(self.weights * r0 * r0)
        return Linearized(H_tt=H, H_ss=_zero6(), H_ts=_zero6(), b_t=b, b_s=jnp.zeros(6, jnp.float32), error=err, num_inliers=jnp.int32(1))

    def error(self, poses: jax.Array) -> jax.Array:
        r = self._residual(poses[self.key])
        return jnp.sum(self.weights * r * r)


@dataclasses.dataclass(frozen=True)
class BetweenFactor:
    """E = || Log(measured⁻¹ · (T_a⁻¹ T_b)) ||²_W."""

    measured: jax.Array  # [4, 4]
    weights: jax.Array  # [6]
    target_key: int
    source_key: int

    @property
    def keys(self):
        return (self.target_key, self.source_key)

    def _residual(self, T_a, T_b):
        return se3.se3_log(se3.se3_inverse(self.measured) @ se3.se3_inverse(T_a) @ T_b)

    def linearize(self, poses: jax.Array) -> Linearized:
        T_a, T_b = poses[self.target_key], poses[self.source_key]
        r0 = self._residual(T_a, T_b)

        def at(xi):
            return self._residual(T_a @ se3.se3_exp(xi[:6]), T_b @ se3.se3_exp(xi[6:]))

        J = jax.jacfwd(at)(jnp.zeros((12,), jnp.float32))
        WJ = J * self.weights[:, None]
        H = J.T @ WJ
        b = -(J.T @ (self.weights * r0))
        err = jnp.sum(self.weights * r0 * r0)
        return Linearized(
            H_tt=H[:6, :6], H_ss=H[6:, 6:], H_ts=H[:6, 6:], b_t=b[:6], b_s=b[6:], error=err, num_inliers=jnp.int32(1)
        )

    def error(self, poses: jax.Array) -> jax.Array:
        return jnp.sum(self.weights * self._residual(poses[self.target_key], poses[self.source_key]) ** 2)


@dataclasses.dataclass(frozen=True)
class LinearDampingFactor:
    """Constant diagonal Hessian prior for gauge fixing (reference:
    include/gtsam_points/factors/linear_damping_factor.hpp:16)."""

    weights: jax.Array  # [6]
    key: int

    @property
    def keys(self):
        return (self.key,)

    def linearize(self, poses: jax.Array) -> Linearized:
        return Linearized(
            H_tt=jnp.diag(self.weights),
            H_ss=_zero6(),
            H_ts=_zero6(),
            b_t=jnp.zeros(6, jnp.float32),
            b_s=jnp.zeros(6, jnp.float32),
            error=jnp.float32(0.0),
            num_inliers=jnp.int32(1),
        )

    def error(self, poses: jax.Array) -> jax.Array:
        return jnp.float32(0.0)


register_factor(PriorFactor, data_fields=["prior", "weights"], meta_fields=["key"])
register_factor(BetweenFactor, data_fields=["measured", "weights"], meta_fields=["target_key", "source_key"])
register_factor(LinearDampingFactor, data_fields=["weights"], meta_fields=["key"])
