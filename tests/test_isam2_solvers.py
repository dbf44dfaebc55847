"""ISAM2-style API + pluggable solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.factors import BetweenFactor, PriorFactor
from gtsam_points_tpu.optim import FactorGraph
from gtsam_points_tpu.optim.isam2 import ISAM2Ext, ISAM2ExtDummy
from gtsam_points_tpu.optim.solvers import cg_solve
from gtsam_points_tpu.utils import se3


def test_isam2_incremental_insertion():
    """Incremental insertion reaches the same accuracy as batch (reference:
    test_graph_isam2 pattern)."""
    rng = np.random.RandomState(0)
    isam = ISAM2Ext(max_poses=6)
    w = jnp.ones(6) * 100.0
    T, deltas = [np.eye(4, dtype=np.float32)], []
    for i in range(5):
        d = np.asarray(se3.se3_exp(jnp.asarray([0.02, 0.0, 0.05, 1.0, 0.1, 0.0], dtype=jnp.float32)))
        deltas.append(d)
        T.append(T[-1] @ d)

    res = isam.update(
        [PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0)],
        {0: jnp.eye(4)},
    )
    for i in range(1, 6):
        init = jnp.asarray(T[i]) @ se3.se3_exp(jnp.asarray(rng.randn(6).astype(np.float32) * 0.05))
        res = isam.update(
            [BetweenFactor(measured=jnp.asarray(deltas[i - 1]), weights=w, target_key=i - 1, source_key=i)],
            {i: init},
        )
        assert res.error_after <= res.error_before + 1e-3
    for i in range(6):
        rot_e, trans_e = se3.pose_error(jnp.asarray(T[i]), isam.calculate_estimate()[i])
        assert float(rot_e) < 1e-3 and float(trans_e) < 1e-2
    assert "error" in res.to_string()


def test_isam2_dummy_noop():
    isam = ISAM2ExtDummy(max_poses=2)
    T1 = se3.se3_exp(jnp.array([0.1, 0, 0, 1.0, 0, 0]))
    isam.update([PriorFactor(prior=jnp.eye(4), weights=jnp.ones(6), key=0)], {0: jnp.eye(4), 1: T1})
    np.testing.assert_allclose(np.asarray(isam.calculate_estimate()[1]), np.asarray(T1))


def test_cg_solver_matches_cholesky():
    """Block-Jacobi CG solves the damped GN system to dense accuracy."""
    rng = np.random.RandomState(1)
    n = 8  # poses
    J = rng.randn(6 * n * 2, 6 * n).astype(np.float32)
    A = jnp.asarray(J.T @ J + 1e-2 * np.eye(6 * n, dtype=np.float32))
    b = jnp.asarray(rng.randn(6 * n).astype(np.float32))
    x_chol = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(A, lower=True), b)
    x_cg = cg_solve(A, b, tol=1e-10, maxiter=500)
    np.testing.assert_allclose(np.asarray(x_cg), np.asarray(x_chol), rtol=1e-2, atol=1e-3)
