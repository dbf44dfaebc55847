"""Planar fast-path parity: the analytic planar linearization
(ops/planar.py, used by VGICPFactor) must match the forward-mode AD path
(factors/linearized.py) to float32 tolerance on the same inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.factors.base import MatchingFactorMixin, factor_poses
from gtsam_points_tpu.factors.linearized import linearize_residuals
from gtsam_points_tpu.factors import make_vgicp_factor
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3


def box_cloud(n=6000, seed=0, noise=0.02):
    rng = np.random.RandomState(seed)
    pts = []
    for ax in range(3):
        p = rng.rand(n // 3, 3) * 10 - 5
        p[:, ax] = np.sign(p[:, ax]) * 5 + rng.randn(n // 3) * noise
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


def _ad_linearize(factor, poses):
    """The generic AD path (what MatchingFactorMixin.linearize did before the
    planar override)."""
    T_t, T_s = factor_poses(factor, poses)
    return linearize_residuals(factor.residual_closure(T_t, T_s), T_t, T_s)


def test_vgicp_planar_matches_ad():
    pts = box_cloud()
    target = estimate_normals_covs(make_frame(pts), k=8, grid_leaf=1.0)
    T_true = se3.se3_exp(jnp.asarray([0.04, -0.03, 0.05, 0.25, -0.15, 0.1]))
    src = np.asarray(se3.transform_points(se3.se3_inverse(T_true), jnp.asarray(pts)))
    source = estimate_normals_covs(make_frame(src), k=8, grid_leaf=1.0)
    factor = make_vgicp_factor(0, 1, target, source, voxel_resolution=1.0, min_voxel_points=3)

    poses = jnp.stack([jnp.eye(4), np.asarray(se3.se3_exp(0.5 * jnp.asarray([0.04, -0.03, 0.05, 0.25, -0.15, 0.1])))])
    lin_p = jax.jit(factor.linearize)(poses)
    lin_ad = jax.jit(lambda p: _ad_linearize(factor, p))(poses)

    assert int(lin_p.num_inliers) == int(lin_ad.num_inliers) > 100
    scale = float(jnp.max(jnp.abs(lin_ad.H_tt))) + 1e-6
    for name in ("H_tt", "H_ss", "H_ts"):
        np.testing.assert_allclose(
            np.asarray(getattr(lin_p, name)), np.asarray(getattr(lin_ad, name)),
            atol=2e-3 * scale, err_msg=name,
        )
    bscale = float(jnp.max(jnp.abs(lin_ad.b_t))) + 1e-6
    np.testing.assert_allclose(np.asarray(lin_p.b_t), np.asarray(lin_ad.b_t), atol=2e-3 * bscale)
    np.testing.assert_allclose(np.asarray(lin_p.b_s), np.asarray(lin_ad.b_s), atol=2e-3 * bscale)
    np.testing.assert_allclose(float(lin_p.error), float(lin_ad.error), rtol=1e-4)


def test_vgicp_planar_error_matches_ad():
    pts = box_cloud(seed=3)
    target = estimate_normals_covs(make_frame(pts), k=8, grid_leaf=1.0)
    src = pts + np.random.RandomState(1).randn(*pts.shape).astype(np.float32) * 0.01
    source = estimate_normals_covs(make_frame(src), k=8, grid_leaf=1.0)
    factor = make_vgicp_factor(0, 1, target, source, voxel_resolution=1.0, min_voxel_points=3)
    poses = jnp.stack([jnp.eye(4), jnp.eye(4)])

    from gtsam_points_tpu.factors.linearized import evaluate_error

    T_t, T_s = factor_poses(factor, poses)
    err_ad = float(evaluate_error(factor.residual_closure(T_t, T_s), T_t, T_s))
    err_p = float(jax.jit(factor.error)(poses))
    np.testing.assert_allclose(err_p, err_ad, rtol=1e-4)


def test_planar_sym_helpers():
    from gtsam_points_tpu.ops import planar

    rng = np.random.RandomState(0)
    n = 64
    A = rng.randn(n, 3, 3).astype(np.float32)
    C = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3, dtype=np.float32)
    C6 = jnp.stack([C[:, 0, 0], C[:, 0, 1], C[:, 0, 2], C[:, 1, 1], C[:, 1, 2], C[:, 2, 2]])
    v = jnp.asarray(rng.randn(3, n).astype(np.float32))

    out = np.asarray(planar.sym_mul(C6, v))
    expect = np.einsum("nij,jn->in", C, np.asarray(v))
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)

    inv6 = np.asarray(planar.sym_inv(C6))
    Cinv = np.linalg.inv(C)
    expect6 = np.stack([Cinv[:, 0, 0], Cinv[:, 0, 1], Cinv[:, 0, 2], Cinv[:, 1, 1], Cinv[:, 1, 2], Cinv[:, 2, 2]])
    np.testing.assert_allclose(inv6, expect6, rtol=1e-2, atol=1e-3)

    R = np.asarray(se3.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    rot6 = np.asarray(planar.sym_rotate(jnp.asarray(R), C6))
    RC = np.einsum("ij,njk,lk->nil", R, C, R)
    expect6 = np.stack([RC[:, 0, 0], RC[:, 0, 1], RC[:, 0, 2], RC[:, 1, 1], RC[:, 1, 2], RC[:, 2, 2]])
    np.testing.assert_allclose(rot6, expect6, rtol=1e-4, atol=1e-4)
