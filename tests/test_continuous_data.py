"""Continuous-trajectory fit + IMU prediction on the real data/continuous
recordings — the reference's IMUTest protocol
(src/test/test_continuous_trajectory.cpp:178-215 and imu_test :139-157):
fit a 0.1 s-knot B-spline to traj.txt poses, then the spline's predicted IMU
must match imu.txt within 0.2 m/s^2 (accel) and 0.05 rad/s (gyro), and the
fit must reproduce the pose samples within 0.1 (rot/trans)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.bspline import fit_knots


@pytest.fixture(scope="module")
def continuous(data_root):
    traj = np.loadtxt(os.path.join(data_root, "continuous/traj.txt"))
    imu = np.loadtxt(os.path.join(data_root, "continuous/imu.txt"))
    # f32 can't hold epoch-scale stamps (~1.6e9): shift to a local time origin
    t_origin = traj[0, 0]
    stamps = (traj[:, 0] - t_origin).astype(np.float32)
    poses = np.asarray(se3.pose_from_xyzq(jnp.asarray(traj[:, 1:].astype(np.float32))))
    imu_stamps = (imu[:, 0] - t_origin).astype(np.float32)
    imu_meas = imu[:, 1:].astype(np.float32)  # [M, 6]: acc xyz, gyro xyz
    return stamps, poses, imu_stamps, imu_meas


def test_fit_reproduces_trajectory(continuous):
    stamps, poses, _, _ = continuous
    traj = fit_knots(
        jnp.asarray(stamps), jnp.asarray(poses),
        t0=float(stamps[0]), t1=float(stamps[-1]), knot_interval=0.1,
    )
    pred = traj.pose(jnp.asarray(stamps))
    rot_e, trans_e = se3.pose_error(jnp.asarray(poses), pred)
    assert float(jnp.max(rot_e)) < 0.1, float(jnp.max(rot_e))
    assert float(jnp.max(trans_e)) < 0.1, float(jnp.max(trans_e))


def test_imu_prediction_matches_measurements(continuous):
    stamps, poses, imu_stamps, imu_meas = continuous
    traj = fit_knots(
        jnp.asarray(stamps), jnp.asarray(poses),
        t0=float(stamps[0]), t1=float(stamps[-1]), knot_interval=0.1,
    )
    inside = (imu_stamps > stamps[0]) & (imu_stamps < stamps[-1])
    ts = jnp.asarray(imu_stamps[inside])
    gt = imu_meas[inside]
    acc, gyro = traj.imu(ts)
    acc_err = np.abs(np.asarray(acc) - gt[:, :3])
    gyro_err = np.abs(np.asarray(gyro) - gt[:, 3:])
    # reference bounds: accel 0.2 m/s^2, gyro 0.05 rad/s per component
    # (test_continuous_trajectory.cpp:154-155)
    assert float(np.quantile(acc_err, 0.99)) < 0.2, float(np.quantile(acc_err, 0.99))
    assert float(np.quantile(gyro_err, 0.99)) < 0.05, float(np.quantile(gyro_err, 0.99))
    assert float(acc_err.max()) < 0.5
    assert float(gyro_err.max()) < 0.15
