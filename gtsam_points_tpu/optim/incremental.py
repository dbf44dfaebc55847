"""Incremental optimization: marginal priors, Schur-complement marginalization,
and a fixed-lag smoother.

TPU-idiomatic replacement for ISAM2Ext / IncrementalFixedLagSmootherExt
(reference: include/gtsam_points/optimizers/isam2_ext.hpp:52,
incremental_fixed_lag_smoother_ext.hpp:44-150). Instead of incremental Bayes-tree
re-elimination (pointer-heavy, data-dependent), the window of recent poses is
fully relinearized in one fused launch each update — on TPU, dense
relinearization of a bounded window beats sparse incremental elimination until
window sizes are very large (SURVEY.md §7.8). Out-of-window variables are
marginalized by Schur complement into a dense MarginalPriorFactor, which keeps
their information exactly (at the linearization point) like the reference's
fixed-lag marginalization.

Fallback behavior (reference: IncrementalFixedLagSmootherExtWithFallback,
src/.../incremental_fixed_lag_smoother_ext_with_fallback.cpp:34-95): if an
update produces non-finite estimates, the smoother rebuilds from its retained
factors with fresh damping.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.factors.base import register_factor
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.utils import se3


@dataclasses.dataclass(frozen=True)
class MarginalPriorFactor:
    """Dense Gaussian prior over K keys at a linearization point:
    E = || Lᵀ (delta - delta*) ||², delta_k = Log(T_lin_k⁻¹ T_k).

    Produced by Schur-complement marginalization; carries the marginalized
    variables' information exactly."""

    lin_poses: jax.Array  # [K, 4, 4]
    sqrt_info_t: jax.Array  # [6K, 6K] = Lᵀ with H = L Lᵀ
    delta_star: jax.Array  # [6K]
    pose_keys: Tuple[int, ...]

    @property
    def keys(self):
        return self.pose_keys

    def _delta(self, poses):
        key_arr = jnp.asarray(self.pose_keys, dtype=jnp.int32)
        d = se3.se3_log(se3.se3_inverse(self.lin_poses) @ poses[key_arr])
        return d.reshape(-1)

    def _residual(self, poses):
        return self.sqrt_info_t @ (self._delta(poses) - self.delta_star)

    def multi_linearize(self, poses):
        K = len(self.pose_keys)
        key_arr = jnp.asarray(self.pose_keys, dtype=jnp.int32)

        def at(xi):
            perturbed = poses.at[key_arr].set(poses[key_arr] @ se3.se3_exp(xi.reshape(K, 6)))
            return self._residual(perturbed)

        zero = jnp.zeros((K * 6,), jnp.float32)
        r0 = at(zero)
        J = jax.jacfwd(at)(zero)
        return J.T @ J, -(J.T @ r0), jnp.sum(r0 * r0)

    def error(self, poses):
        r = self._residual(poses)
        return jnp.sum(r * r)


register_factor(
    MarginalPriorFactor,
    data_fields=["lin_poses", "sqrt_info_t", "delta_star"],
    meta_fields=["pose_keys"],
)


def marginalize_system(A: jax.Array, b: jax.Array, marg: List[int], keep: List[int]):
    """Schur complement: eliminate 6-blocks `marg`, return (H_keep, b_keep).

    A: [6P, 6P], b: [6P]; marg/keep are pose indices."""
    mi = np.concatenate([np.arange(6 * k, 6 * k + 6) for k in marg])
    ki = np.concatenate([np.arange(6 * k, 6 * k + 6) for k in keep])
    H_mm = A[np.ix_(mi, mi)] + 1e-6 * jnp.eye(len(mi), dtype=A.dtype)
    H_km = A[np.ix_(ki, mi)]
    H_kk = A[np.ix_(ki, ki)]
    sol = jnp.linalg.solve(H_mm, jnp.concatenate([H_km.T, b[mi][:, None]], axis=1))
    X = sol[:, :-1]  # H_mm⁻¹ H_mk
    y = sol[:, -1]  # H_mm⁻¹ b_m
    H_new = H_kk - H_km @ X
    b_new = b[ki] - H_km @ y
    return H_new, b_new


def make_marginal_prior(A, b, poses, marg: List[int], keep: List[int]) -> MarginalPriorFactor:
    """Build the dense prior carrying marginalized information onto `keep`."""
    H_new, b_new = marginalize_system(A, b, marg, keep)
    H_new = 0.5 * (H_new + H_new.T) + 1e-6 * jnp.eye(H_new.shape[0], dtype=H_new.dtype)
    L = jnp.linalg.cholesky(H_new)
    delta_star = jax.scipy.linalg.cho_solve((L, True), b_new)
    keep_arr = jnp.asarray(keep, dtype=jnp.int32)
    return MarginalPriorFactor(
        lin_poses=poses[keep_arr],
        sqrt_info_t=L.T,
        delta_star=delta_star,
        pose_keys=tuple(keep),
    )


class FixedLagSmoother:
    """Timestamp-keyed sliding-window smoother.

    update(key, stamp, initial_pose, factors) adds a pose + its factors,
    marginalizes poses older than `lag` seconds into a MarginalPriorFactor
    (estimates frozen), and optimizes the remaining window with LM.

    Built on ISAM2Ext's machinery (optim/isam2.py): the window program is
    cached by graph structure (stable local slot keys), so steady-state
    updates reuse the compiled executable, and marginalization linearizes only
    the subgraph over the involved keys — never a max_poses-sized dense
    system. Non-finite results trigger a heavy-damping retry (reference:
    IncrementalFixedLagSmootherExtWithFallback,
    src/.../incremental_fixed_lag_smoother_ext_with_fallback.cpp:34-95).
    """

    def __init__(self, lag: float = 10.0, lm_params: Optional[LMParams] = None, max_poses: int = 1024):
        from gtsam_points_tpu.optim.isam2 import ISAM2Ext  # circular-safe

        del max_poses  # legacy: capacity is the active window itself now
        self.lag = lag
        self._isam = ISAM2Ext(
            window_size=1 << 30, lm_params=lm_params or LMParams(max_iterations=10)
        )
        self.stamps: Dict[int, float] = {}

    @property
    def frozen(self) -> Dict[int, np.ndarray]:
        return self._isam.frozen

    @property
    def active(self) -> List[int]:
        return list(self._isam.window)

    @property
    def num_compiles(self) -> int:
        return self._isam.num_compiles

    def update(self, key: int, stamp: float, initial_pose, factors: List):
        self.stamps[key] = stamp
        horizon = stamp - self.lag
        to_marg = [k for k in self._isam.window if self.stamps.get(k, stamp) < horizon]
        if to_marg:
            self._isam._marginalize(to_marg)
        self._isam.update(factors, {key: initial_pose})
        return self._isam.calculate_estimate()

    def add_factors(self, factors: List):
        """Add factors without a new pose/stamp — e.g. a LATE LOOP CLOSURE: a
        factor referencing a marginalized pose triggers the global pose-graph
        relax and corrects frozen history (optim/isam2.py class doc).
        -> ISAM2ResultExt."""
        return self._isam.update(factors)

    def estimate(self, key: int) -> np.ndarray:
        return self._isam.calculate_estimate_pose(key)
