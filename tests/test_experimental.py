"""Sim3/SE3 experimental factor tests (reference:
include/gtsam_points/factors/experimental/between_sim3_se3_factor.hpp)."""

import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.factors.experimental import (
    Sim3,
    align_trajectories_sim3,
    between_sim3_se3_error,
    scaled_transform,
    sim3_apply,
    sim3_matrix,
)
from gtsam_points_tpu.utils import se3


def _rand_pose(rng, rot=0.3, trans=2.0):
    xi = np.concatenate([rng.randn(3) * rot, rng.randn(3) * trans]).astype(np.float32)
    return se3.se3_exp(jnp.asarray(xi))


def test_scaled_transform_and_error_zero():
    rng = np.random.RandomState(0)
    T = _rand_pose(rng)
    s = Sim3(pose=T, scale=jnp.float32(2.0))
    st = np.asarray(scaled_transform(s))
    np.testing.assert_allclose(st[:3, :3], np.asarray(T)[:3, :3], atol=1e-6)
    np.testing.assert_allclose(st[:3, 3], 2.0 * np.asarray(T)[:3, 3], atol=1e-6)
    r = between_sim3_se3_error(s, jnp.asarray(st))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


def test_sim3_matrix_apply():
    rng = np.random.RandomState(1)
    T = _rand_pose(rng)
    s = Sim3(pose=T, scale=jnp.float32(1.7))
    pts = rng.randn(10, 3).astype(np.float32)
    out = np.asarray(sim3_apply(s, jnp.asarray(pts)))
    M = np.asarray(sim3_matrix(s))
    expect = pts @ (M[:3, :3]).T + M[:3, 3]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_align_trajectories_sim3_recovers_scale():
    """A trajectory scaled by s and rigidly moved must be recovered (the
    monocular scale-drift correction use-case)."""
    rng = np.random.RandomState(2)
    P = 12
    poses_a = jnp.stack([_rand_pose(rng, rot=0.2, trans=3.0) for _ in range(P)])
    true_scale = 1.6
    S_pose = _rand_pose(rng, rot=0.3, trans=1.0)
    S = Sim3(pose=S_pose, scale=jnp.float32(true_scale))

    def apply_sim3_to_pose(T):
        out = S.pose @ T
        return scaled_transform(Sim3(pose=out, scale=S.scale))

    poses_b = jnp.stack([apply_sim3_to_pose(poses_a[i]) for i in range(P)])
    est = align_trajectories_sim3(poses_a, poses_b, iterations=30)
    assert abs(float(est.scale) - true_scale) < 1e-3
    err = np.asarray(se3.se3_log(se3.se3_inverse(est.pose) @ S_pose))
    np.testing.assert_allclose(err, 0.0, atol=1e-3)
