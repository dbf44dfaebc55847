"""B-spline trajectory tests (reference pattern: continuous trajectory fit to
pose samples, src/test/ uses data/continuous; here synthetic smooth motion)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.bspline import ContinuousTrajectory, bspline_pose, fit_knots


def smooth_trajectory(ts):
    """Analytic smooth SE3 trajectory for testing."""
    poses = []
    for t in ts:
        w = np.array([0.1 * np.sin(t), 0.05 * t, 0.2 * np.cos(0.5 * t)], dtype=np.float32)
        p = np.array([2 * t, np.sin(t), 0.5 * t * t * 0.1], dtype=np.float32)
        poses.append(np.asarray(se3.make_transform(se3.so3_exp(jnp.asarray(w)), jnp.asarray(p))))
    return np.stack(poses)


def test_bspline_interpolates_static_pose():
    T = se3.se3_exp(jnp.array([0.1, 0.2, -0.1, 1.0, 2.0, 3.0]))
    knots = jnp.tile(T[None], (6, 1, 1))
    out = bspline_pose(knots, jnp.asarray(0.3), jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(T), atol=1e-5)


def test_fit_knots_reproduces_samples():
    ts = np.linspace(0.0, 4.0, 40).astype(np.float32)
    poses = smooth_trajectory(ts)
    traj = fit_knots(jnp.asarray(ts), jnp.asarray(poses), t0=0.0, t1=4.0, knot_interval=0.5)
    pred = traj.pose(jnp.asarray(ts))
    rot_e, trans_e = se3.pose_error(jnp.asarray(poses), pred)
    assert float(jnp.max(rot_e)) < 0.01, float(jnp.max(rot_e))
    assert float(jnp.max(trans_e)) < 0.02, float(jnp.max(trans_e))


def test_velocity_matches_finite_difference():
    ts = np.linspace(0.0, 4.0, 40).astype(np.float32)
    poses = smooth_trajectory(ts)
    traj = fit_knots(jnp.asarray(ts), jnp.asarray(poses), t0=0.0, t1=4.0, knot_interval=0.5)
    t = jnp.asarray(1.7)
    eps = 1e-3
    omega, v = traj.velocity(t)
    T0 = traj.pose(t - eps)
    T1 = traj.pose(t + eps)
    v_fd = (T1[:3, 3] - T0[:3, 3]) / (2 * eps)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_fd), atol=5e-2)
