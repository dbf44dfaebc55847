"""GICP: distribution-to-distribution matching-cost factor.

Reference: IntegratedGICPFactor
(include/gtsam_points/factors/integrated_gicp_factor.hpp:20-152,
factors/impl/integrated_gicp_factor_impl.hpp:151-296). Per-point mahalanobis
weight W_i = (C_target_i + delta C_source_i deltaᵀ)⁻¹ is computed (batched
closed-form 3x3 inverse) at the linearization point and frozen through the
Jacobian, matching the reference's FULL fused-cov cache mode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import MatchingFactorMixin, register_factor
from gtsam_points_tpu.factors.linearized import inv3x3
from gtsam_points_tpu.ops.hash_grid import HashGrid, build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3


@dataclasses.dataclass(frozen=True)
class GICPFactor(MatchingFactorMixin):
    target: Frame
    source: Frame
    grid: HashGrid
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    max_corr_dist: float
    num_neighbor_cells: int
    max_points_per_cell: int

    def residual_closure(self, T_t: jax.Array, T_s: jax.Array):
        delta = se3.se3_inverse(T_t) @ T_s
        moved = se3.transform_points(delta, self.source.points)
        idx, _, valid = knn_search(
            self.grid,
            moved,
            self.source.mask,
            k=1,
            num_neighbor_cells=self.num_neighbor_cells,
            max_points_per_cell=self.max_points_per_cell,
            max_sq_dist=self.max_corr_dist**2,
        )
        corr = jnp.maximum(idx[:, 0], 0)
        valid = valid[:, 0]
        q = self.target.points[corr]
        C_t = self.target.covs[corr]
        R = delta[:3, :3]
        fused = C_t + jnp.einsum("ij,njk,lk->nil", R, self.source.covs, R)
        W = inv3x3(fused)

        def residual_fn(T_t_p, T_s_p):
            d = se3.se3_inverse(T_t_p) @ T_s_p
            r = se3.transform_points(d, self.source.points) - q
            return r, W, valid

        return residual_fn

    def correspondences(self, poses: jax.Array):
        """kNN correspondence + fused mahalanobis at `poses` (the expensive
        search). -> (valid [N], q [3,N], W6 [6,N]) in planar layout — the
        payload the reference caches between correspondence updates
        (impl/integrated_gicp_factor_impl.hpp:151-296, FULL cache mode)."""
        from gtsam_points_tpu.factors.base import factor_poses

        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        moved = se3.transform_points(delta, self.source.points)
        idx, _, valid = knn_search(
            self.grid,
            moved,
            self.source.mask,
            k=1,
            num_neighbor_cells=self.num_neighbor_cells,
            max_points_per_cell=self.max_points_per_cell,
            max_sq_dist=self.max_corr_dist**2,
        )
        corr = jnp.maximum(idx[:, 0], 0)
        valid = valid[:, 0]
        q = self.target.points[corr]
        C_t = self.target.covs[corr]
        R = delta[:3, :3]
        fused = C_t + jnp.einsum("ij,njk,lk->nil", R, self.source.covs, R)
        W = inv3x3(fused)
        W6 = jnp.stack(
            [W[:, 0, 0], W[:, 0, 1], W[:, 0, 2], W[:, 1, 1], W[:, 1, 2], W[:, 2, 2]]
        )
        return valid, q.T, W6

    def linearize_corr(self, poses: jax.Array, corr):
        """Analytic linearization on a frozen correspondence set (the GICP
        residual r = delta·p - q is affine in the moved point, so it shares
        the VGICP fused kernel — Pallas on TPU, planar XLA elsewhere; no kNN,
        no AD)."""
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops.pallas_linearize import error_fused, linearize_fused

        valid, q_p, W6 = corr
        pts_p = self.source.points.T
        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        lin = linearize_fused(pts_p, q_p, W6, valid, delta)

        def err_fn(new_poses):
            nT_t, nT_s = factor_poses(self, new_poses)
            nd = se3.se3_inverse(nT_t) @ nT_s
            return error_fused(pts_p, q_p, W6, valid, nd)

        return lin, err_fn

    def linearize(self, poses: jax.Array):
        lin, _ = self.linearize_corr(poses, self.correspondences(poses))
        return lin

    def linearize_with_error_fn(self, poses: jax.Array):
        return self.linearize_corr(poses, self.correspondences(poses))


def make_gicp_factor(
    target_key: int,
    source_key: int,
    target: Frame,
    source: Frame,
    max_corr_dist: float = 5.0,
    grid: Optional[HashGrid] = None,
    grid_leaf: float = 1.0,
    num_neighbor_cells: int = 27,
    max_points_per_cell: int = 16,
    fixed_target_pose: Optional[jax.Array] = None,
    coarse_factor: Optional[int] = None,
) -> GICPFactor:
    if target.covs is None or source.covs is None:
        raise ValueError("GICP requires per-point covariances on both frames")
    if grid is None:
        grid = build_hash_grid(
            target.points, target.mask, grid_leaf, coarse_factor=coarse_factor
        )
    if fixed_target_pose is None:
        fixed_target_pose = jnp.eye(4, dtype=jnp.float32)
    return GICPFactor(
        target=target,
        source=source,
        grid=grid,
        fixed_target_pose=fixed_target_pose,
        target_key=target_key,
        source_key=source_key,
        max_corr_dist=max_corr_dist,
        num_neighbor_cells=num_neighbor_cells,
        max_points_per_cell=max_points_per_cell,
    )


register_factor(
    GICPFactor,
    data_fields=["target", "source", "grid", "fixed_target_pose"],
    meta_fields=[
        "target_key",
        "source_key",
        "max_corr_dist",
        "num_neighbor_cells",
        "max_points_per_cell",
    ],
)
