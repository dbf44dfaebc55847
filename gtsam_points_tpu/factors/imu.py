"""IMU re-integration factor.

Reference: ReintegratedImuFactor / ReintegratedImuMeasurements
(include/gtsam_points/factors/reintegrated_imu_factor.hpp:11-80,
src/gtsam_points/factors/reintegrated_imu_factor.cpp). Unlike GTSAM's
preintegration (which linearizes bias corrections around a fixed expansion
point), the reference RE-integrates the raw measurements at every
linearization. Here that is the natural mode: the integration is a
lax.scan over measurements, differentiable end-to-end by AD — changing the
bias re-traces the whole integral exactly.

Round-1 scope note: the factor couples the two POSE keys of this framework's
pose-only state; start/end velocities and the bias enter as stored parameters
(differentiable for calibration via jax.grad, but not graph variables yet).
Full 15-state (pose, velocity, bias) graph variables are the velocity/bias
extension of optim/graph.py scheduled next round.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import register_factor
from gtsam_points_tpu.factors.misc_factors import _MultiKeyAD
from gtsam_points_tpu.utils import se3

GRAVITY = jnp.asarray([0.0, 0.0, -9.80665], dtype=jnp.float32)


class ImuMeasurements(NamedTuple):
    """Raw IMU samples (reference: ReintegratedImuMeasurements::integrate_measurement).

    dts:   [M] float32 integration интервалы (s); zero-padded tail allowed
    accs:  [M, 3] float32 specific force (body frame)
    gyros: [M, 3] float32 angular velocity (body frame)
    """

    dts: jax.Array
    accs: jax.Array
    gyros: jax.Array


def make_imu_measurements(stamps, accs, gyros, capacity: int | None = None) -> ImuMeasurements:
    import numpy as np

    stamps = np.asarray(stamps, np.float32)
    dts = np.diff(stamps, prepend=stamps[0])
    m = len(dts)
    cap = capacity or m

    def pad(a, d):
        out = np.zeros((cap,) + d, np.float32)
        out[:m] = np.asarray(a, np.float32)[:cap]
        return jnp.asarray(out)

    return ImuMeasurements(dts=pad(dts, ()), accs=pad(accs, (3,)), gyros=pad(gyros, (3,)))


def reintegrate(meas: ImuMeasurements, bias_acc, bias_gyro, gravity=GRAVITY):
    """Integrate raw measurements -> (delta_R [3,3], delta_p [3], delta_v [3],
    total_dt). Gravity-free body-frame deltas (standard preintegration form),
    recomputed from scratch — AD through this gives exact bias Jacobians."""

    def step(carry, m):
        R, p, v = carry
        dt, acc, gyro = m
        a = acc - bias_acc
        w = gyro - bias_gyro
        p = p + v * dt + 0.5 * (R @ a) * dt * dt
        v = v + (R @ a) * dt
        R = R @ se3.so3_exp(w * dt)
        return (R, p, v), None

    init = (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32))
    (R, p, v), _ = jax.lax.scan(step, init, (meas.dts, meas.accs, meas.gyros))
    return R, p, v, jnp.sum(meas.dts)


@dataclasses.dataclass(frozen=True)
class ReintegratedImuFactor(_MultiKeyAD):
    """Couples poses (i, j) through the re-integrated IMU delta.

    Residual (6D): [Log(dR_imuᵀ · R_iᵀ R_j);
                    R_iᵀ(p_j - p_i - v_i·dt - ½g·dt²) - dp_imu] weighted.
    """

    measurements: ImuMeasurements
    v_i: jax.Array  # [3] world-frame velocity at i (parameter)
    bias_acc: jax.Array  # [3]
    bias_gyro: jax.Array  # [3]
    weights: jax.Array  # [6]
    pose_keys: Tuple[int, int]

    def _residual(self, T):
        dR, dp, dv, dt = reintegrate(self.measurements, self.bias_acc, self.bias_gyro)
        R_i, p_i = T[0, :3, :3], T[0, :3, 3]
        R_j, p_j = T[1, :3, :3], T[1, :3, 3]
        r_rot = se3.so3_log(dR.T @ R_i.T @ R_j)
        pred_p = R_i.T @ (p_j - p_i - self.v_i * dt - 0.5 * GRAVITY * dt * dt)
        r_pos = pred_p - dp
        return jnp.sqrt(self.weights) * jnp.concatenate([r_rot, r_pos])

    def predict(self, T_i: jax.Array):
        """Forward-predict pose j from pose i (for odometry initialization)."""
        dR, dp, dv, dt = reintegrate(self.measurements, self.bias_acc, self.bias_gyro)
        R_i, p_i = T_i[:3, :3], T_i[:3, 3]
        R_j = R_i @ dR
        p_j = p_i + self.v_i * dt + 0.5 * GRAVITY * dt * dt + R_i @ dp
        v_j = self.v_i + GRAVITY * dt + R_i @ dv
        return se3.make_transform(R_j, p_j), v_j


register_factor(
    ReintegratedImuFactor,
    data_fields=["measurements", "v_i", "bias_acc", "bias_gyro", "weights"],
    meta_fields=["pose_keys"],
)
