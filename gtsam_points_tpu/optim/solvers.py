"""Pluggable linear solvers for the damped Gauss-Newton system.

Reference: GaussianFactorGraphSolver / DenseLinearSolver / SparseLinearSolver
(include/gtsam_points/optimizers/gaussian_factor_graph_solver.hpp:14-51,
linear_solver.hpp:11-24, linear_system_builder.hpp:15-73). The dense Cholesky
is the default (optim/lm.py); this module adds:

- cg_solve: matrix-free preconditioned conjugate gradients with block-Jacobi
  (6x6) preconditioning — the large-graph path where a 6Px6P dense factorization
  stops fitting (the TPU analogue of the reference's sparse path).
- schur_pose_landmark: generic two-block Schur elimination (wraps
  optim/incremental.marginalize_system).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.linearized import inv3x3  # noqa: F401  (re-export convenience)
from gtsam_points_tpu.optim.incremental import marginalize_system


def block_jacobi_preconditioner(A: jax.Array, block: int = 6) -> Callable:
    """Invert the 6x6 diagonal blocks of A once; apply as preconditioner."""
    n = A.shape[0] // block
    idx = jnp.arange(n)
    diag = A.reshape(n, block, n, block)[idx, :, idx, :]  # [n, 6, 6]
    diag = diag + 1e-8 * jnp.eye(block, dtype=A.dtype)
    inv = jnp.linalg.inv(diag)

    def apply(r):
        return (inv @ r.reshape(n, block, 1)).reshape(-1)

    return apply


def cg_solve(
    A: jax.Array,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    tol: float = 1e-6,
    maxiter: Optional[int] = None,
) -> jax.Array:
    """Block-Jacobi preconditioned CG on the dense (or implicitly dense) system."""
    M = block_jacobi_preconditioner(A)
    x, _ = jax.scipy.sparse.linalg.cg(
        lambda v: A @ v, b, x0=x0, tol=tol, maxiter=maxiter, M=M
    )
    return x


def schur_pose_landmark(A, b, pose_indices, landmark_indices):
    """Eliminate landmark blocks onto pose blocks (reference's Schur path for
    BA; 6-dof blocks on both sides here)."""
    return marginalize_system(A, b, list(landmark_indices), list(pose_indices))
