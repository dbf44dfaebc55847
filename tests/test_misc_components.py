"""Tests for the long-tail components: occupancy grid, incremental covariance
map, IMU reintegration, frame funcs, stats utilities, dogleg, misc factors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import BetweenFactor, PriorFactor
from gtsam_points_tpu.factors.imu import ReintegratedImuFactor, make_imu_measurements, reintegrate, GRAVITY
from gtsam_points_tpu.factors.misc_factors import Pose3CalibFactor, Pose3InterpolationFactor, RotateVector3Factor
from gtsam_points_tpu.ops.incremental_covariance import (
    empty_incremental_covariance_map,
    insert,
    knn_search_valid,
)
from gtsam_points_tpu.ops.occupancy import build_occupancy_grid, calc_overlap, occupied
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.dogleg import optimize_dogleg
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.types.frame_funcs import median_distance, minmax_distance, sort_by_time
from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.stats import IndexedSlidingWindow, RunningStatistics


def test_occupancy_grid():
    rng = np.random.RandomState(0)
    pts = (rng.rand(500, 3) * 10).astype(np.float32)
    f = make_frame(pts)
    grid = build_occupancy_grid(f.points, f.mask, leaf=0.5)
    occ = occupied(grid, f.points, f.mask)
    assert bool(jnp.all(occ[:500]))
    ov = calc_overlap(grid, f.points, f.mask)
    assert float(ov) == pytest.approx(1.0, abs=1e-6)
    far = make_frame(pts + 100.0)
    assert float(calc_overlap(grid, far.points, far.mask)) == pytest.approx(0.0, abs=1e-6)


def test_incremental_covariance_map():
    rng = np.random.RandomState(1)
    # plane cloud -> valid planar stats
    xy = rng.rand(600, 2).astype(np.float32) * 10
    pts = np.concatenate([xy, rng.randn(600, 1).astype(np.float32) * 0.01], axis=1)
    cmap = empty_incremental_covariance_map(2048)
    cmap = insert(cmap, make_frame(pts[:300]))
    cmap = insert(cmap, make_frame(pts[300:]))
    assert int(jnp.sum(cmap.mask)) == 600
    # most points valid, normals approx +-z
    frac_valid = float(jnp.sum(cmap.valid) / jnp.sum(cmap.mask))
    assert frac_valid > 0.7, frac_valid
    nz = np.abs(np.asarray(cmap.normals)[np.asarray(cmap.valid)][:, 2])
    assert (nz > 0.95).mean() > 0.9
    idx, sq, valid = knn_search_valid(cmap, cmap.points, cmap.mask, 5)
    assert bool(jnp.any(valid))


def test_imu_reintegration_static():
    """Static IMU (measuring -gravity) integrates to identity motion."""
    m = make_imu_measurements(
        stamps=np.arange(0.0, 1.0, 0.01),
        accs=np.tile(-np.asarray([0.0, 0.0, -9.80665]), (100, 1)),
        gyros=np.zeros((100, 3)),
    )
    dR, dp, dv, dt = reintegrate(m, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(dR), np.eye(3), atol=1e-5)
    # body-frame deltas include gravity compensation at prediction time:
    # dp here = ∫∫a = -0.5 g t² (gravity-free frame), cancels in predict()
    factor = ReintegratedImuFactor(
        measurements=m, v_i=jnp.zeros(3), bias_acc=jnp.zeros(3), bias_gyro=jnp.zeros(3),
        weights=jnp.ones(6) * 100.0, pose_keys=(0, 1),
    )
    T_pred, v_pred = factor.predict(jnp.eye(4))
    np.testing.assert_allclose(np.asarray(T_pred), np.eye(4), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_pred), np.zeros(3), atol=1e-4)


def test_imu_factor_constrains_pose():
    """IMU factor pulls pose j to the integrated prediction."""
    rng = np.random.RandomState(2)
    # constant yaw rotation + forward acceleration
    gyros = np.tile([0.0, 0.0, 0.3], (100, 1))
    accs = np.tile([1.0, 0.0, 9.80665], (100, 1))  # body frame approx
    m = make_imu_measurements(np.arange(0.0, 1.0, 0.01), accs, gyros)
    factor = ReintegratedImuFactor(
        measurements=m, v_i=jnp.zeros(3), bias_acc=jnp.zeros(3), bias_gyro=jnp.zeros(3),
        weights=jnp.ones(6) * 100.0, pose_keys=(0, 1),
    )
    T_pred, _ = factor.predict(jnp.eye(4))
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(factor)
    noise = jnp.asarray(rng.randn(6).astype(np.float32) * 0.1)
    poses0 = jnp.stack([jnp.eye(4), T_pred @ se3.se3_exp(noise)])
    res = optimize_lm(graph, poses0)
    rot_e, trans_e = se3.pose_error(T_pred, res.poses[1])
    assert float(rot_e) < 1e-3 and float(trans_e) < 1e-2


def test_dogleg_converges():
    T01 = se3.se3_exp(jnp.array([0.1, -0.05, 0.2, 1.0, 0.5, -0.2]))
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(BetweenFactor(measured=T01, weights=jnp.ones(6) * 100, target_key=0, source_key=1))
    poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = optimize_dogleg(graph, poses0)
    rot_e, trans_e = se3.pose_error(T01, res.poses[1])
    assert float(rot_e) < 1e-4 and float(trans_e) < 1e-3


def test_misc_factors_jacobians():
    """Calib/interp/rotate factors: error decreases to 0 at the consistent config."""
    Tb = se3.se3_exp(jnp.array([0.1, 0.2, -0.1, 1.0, 0.0, 0.5]))
    Ts = se3.se3_exp(jnp.array([0.0, 0.3, 0.1, 0.2, -0.1, 0.0]))
    calib = Pose3CalibFactor(weights=jnp.ones(6) * 100, pose_keys=(0, 1, 2))
    poses = jnp.stack([Tb, Ts, Tb @ Ts])
    assert float(calib.error(poses)) < 1e-8
    H, b, err = calib.multi_linearize(poses)
    assert H.shape == (18, 18) and float(err) < 1e-8

    interp = Pose3InterpolationFactor(t=jnp.float32(0.5), weights=jnp.ones(6) * 100, pose_keys=(0, 1, 2))
    T_a, T_b = jnp.eye(4), Tb
    xi = se3.se3_log(se3.se3_inverse(T_a) @ T_b)
    T_mid = T_a @ se3.se3_exp(0.5 * xi)
    assert float(interp.error(jnp.stack([T_a, T_b, T_mid]))) < 1e-8

    rot = RotateVector3Factor(
        local=jnp.asarray([0.0, 0.0, 1.0]),
        world=Tb[:3, :3] @ jnp.asarray([0.0, 0.0, 1.0]),
        weights=jnp.ones(3) * 10,
        pose_keys=(0,),
    )
    assert float(rot.error(Tb[None])) < 1e-8


def test_frame_funcs():
    rng = np.random.RandomState(3)
    pts = rng.randn(100, 3).astype(np.float32) * 3
    times = rng.rand(100).astype(np.float32)
    f = make_frame(pts, times=times)
    fs = sort_by_time(f)
    t = np.asarray(fs.times)[np.asarray(fs.mask)]
    assert (np.diff(t) >= 0).all()
    dmin, dmax = minmax_distance(f)
    d = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(float(dmin), d.min(), rtol=1e-5)
    np.testing.assert_allclose(float(dmax), d.max(), rtol=1e-5)
    med = float(median_distance(f, num_samples=128))
    assert 0.5 * np.median(d) < med < 2.0 * np.median(d)


def test_stats_utils():
    rs = RunningStatistics.empty((2,))
    data = np.random.RandomState(4).randn(50, 2).astype(np.float32)
    for row in data:
        rs = rs.add(jnp.asarray(row))
    np.testing.assert_allclose(np.asarray(rs.mean()), data.mean(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rs.std()), data.std(0), atol=1e-3)

    win = IndexedSlidingWindow(max_size=3)
    for i in range(5):
        assert win.push(f"item{i}") == i
    assert win.first_index == 2 and win.last_index == 4
    assert win[3] == "item3"
    assert 1 not in win
    with pytest.raises(IndexError):
        win[0]
