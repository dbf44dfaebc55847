"""Misc analytic pose factors (reference: factors/pose3_calib_factor.hpp:15,
pose3_interpolation_factor.hpp:15, rotate_vector3_factor.hpp:13). Jacobians by
AD over the same multi_linearize protocol."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import register_factor
from gtsam_points_tpu.utils import se3


class _MultiKeyAD:
    """Helper: subclasses define _residual(poses_subset [K,4,4]) -> [D]."""

    @property
    def keys(self) -> Tuple[int, ...]:
        return self.pose_keys

    def multi_linearize(self, poses):
        K = len(self.pose_keys)
        key_arr = jnp.asarray(self.pose_keys, dtype=jnp.int32)
        sub = poses[key_arr]

        def at(xi):
            return self._residual(sub @ se3.se3_exp(xi.reshape(K, 6)))

        zero = jnp.zeros((K * 6,), jnp.float32)
        r0 = at(zero)
        J = jax.jacfwd(at)(zero)
        return J.T @ J, -(J.T @ r0), jnp.sum(r0 * r0)

    def error(self, poses):
        key_arr = jnp.asarray(self.pose_keys, dtype=jnp.int32)
        r = self._residual(poses[key_arr])
        return jnp.sum(r * r)


@dataclasses.dataclass(frozen=True)
class Pose3CalibFactor(_MultiKeyAD):
    """Extrinsic calibration: world_T_sensor = world_T_base · base_T_sensor.
    Keys: (world_T_base, base_T_sensor, world_T_sensor)."""

    weights: jax.Array  # [6]
    pose_keys: Tuple[int, int, int]

    def _residual(self, T):
        pred = T[0] @ T[1]
        return jnp.sqrt(self.weights) * se3.se3_log(se3.se3_inverse(pred) @ T[2])


@dataclasses.dataclass(frozen=True)
class Pose3InterpolationFactor(_MultiKeyAD):
    """T_mid must equal the twist interpolation of (T_a, T_b) at ratio t.
    Keys: (T_a, T_b, T_mid)."""

    t: jax.Array  # () interpolation ratio in [0, 1]
    weights: jax.Array
    pose_keys: Tuple[int, int, int]

    def _residual(self, T):
        xi = se3.se3_log(se3.se3_inverse(T[0]) @ T[1])
        pred = T[0] @ se3.se3_exp(self.t * xi)
        return jnp.sqrt(self.weights) * se3.se3_log(se3.se3_inverse(pred) @ T[2])


@dataclasses.dataclass(frozen=True)
class RotateVector3Factor(_MultiKeyAD):
    """R(T) · local must equal world (direction alignment, e.g. gravity).
    Key: (T,)."""

    local: jax.Array  # [3]
    world: jax.Array  # [3]
    weights: jax.Array  # [3]
    pose_keys: Tuple[int]

    def _residual(self, T):
        pred = T[0, :3, :3] @ self.local
        return jnp.sqrt(self.weights) * (pred - self.world)


register_factor(Pose3CalibFactor, data_fields=["weights"], meta_fields=["pose_keys"])
register_factor(Pose3InterpolationFactor, data_fields=["t", "weights"], meta_fields=["pose_keys"])
register_factor(RotateVector3Factor, data_fields=["local", "world", "weights"], meta_fields=["pose_keys"])
