"""Finite-difference Jacobian/Hessian validation harness.

Reference: util/jacobian_test.hpp:44-100 — perturb each key by ±eps and compare
the analytic linearization against numeric differences. Because our factors
linearize by AD, this harness validates the *residual definition + retraction
convention* end to end (b must equal -1/2 dE/dxi).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.utils import se3


def numeric_gradient(error_fn, poses: np.ndarray, key: int, eps: float = 1e-4) -> np.ndarray:
    """d error / d xi_key via central differences (right retraction)."""
    grad = np.zeros(6, dtype=np.float64)
    for i in range(6):
        xi = np.zeros(6, dtype=np.float32)
        xi[i] = eps
        pp = np.array(poses)
        pp[key] = poses[key] @ np.asarray(se3.se3_exp(jnp.asarray(xi)))
        e_plus = float(error_fn(jnp.asarray(pp)))
        pp = np.array(poses)
        pp[key] = poses[key] @ np.asarray(se3.se3_exp(jnp.asarray(-xi)))
        e_minus = float(error_fn(jnp.asarray(pp)))
        grad[i] = (e_plus - e_minus) / (2 * eps)
    return grad


def check_factor_jacobian(factor, poses, eps: float = 1e-4, rtol: float = 5e-2, atol: float = 1e-2):
    """Assert the factor's linearized b blocks match numeric gradients.

    With E = sum rᵀWr and b = -JᵀWr: dE/dxi = -2 b (holding W and
    correspondences frozen). We freeze them by fixing the residual closure at
    the linearization point.
    """
    T_t, T_s = None, None
    lin = factor.linearize(jnp.asarray(poses))
    from gtsam_points_tpu.factors.base import factor_poses
    from gtsam_points_tpu.factors.linearized import evaluate_error

    T_t0, T_s0 = factor_poses(factor, jnp.asarray(poses))
    closure = factor.residual_closure(T_t0, T_s0)

    keys = factor.keys
    results = {}
    # gradient wrt source key
    def err_s(xi):
        return evaluate_error(closure, T_t0, T_s0 @ se3.se3_exp(xi))

    g_s = _numeric_grad6(err_s, eps)
    np.testing.assert_allclose(np.asarray(-2.0 * lin.b_s), g_s, rtol=rtol, atol=atol)
    results["source"] = g_s

    if len(keys) == 2 and keys[0] >= 0:
        def err_t(xi):
            return evaluate_error(closure, T_t0 @ se3.se3_exp(xi), T_s0)

        g_t = _numeric_grad6(err_t, eps)
        np.testing.assert_allclose(np.asarray(-2.0 * lin.b_t), g_t, rtol=rtol, atol=atol)
        results["target"] = g_t
    return results


def _numeric_grad6(f, eps):
    g = np.zeros(6)
    for i in range(6):
        xi = np.zeros(6, dtype=np.float32)
        xi[i] = eps
        g[i] = (float(f(jnp.asarray(xi))) - float(f(jnp.asarray(-xi)))) / (2 * eps)
    return g
