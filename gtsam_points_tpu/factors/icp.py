"""Point-to-point and point-to-plane ICP factors.

Reference: IntegratedICPFactor / IntegratedPointToPlaneICPFactor
(include/gtsam_points/factors/integrated_icp_factor.hpp:22-161,
factors/impl/integrated_icp_factor_impl.hpp). Correspondences are 1-NN of the
delta-transformed source points in the target cloud; here the 1-NN runs as a
batched grid search over all points at once instead of a per-point KdTree
descent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import MatchingFactorMixin, register_factor
from gtsam_points_tpu.ops.hash_grid import HashGrid, build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3


@dataclasses.dataclass(frozen=True)
class ICPFactor(MatchingFactorMixin):
    target: Frame
    source: Frame
    grid: HashGrid
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    point_to_plane: bool
    max_corr_dist: float
    num_neighbor_cells: int
    max_points_per_cell: int

    def _search(self, delta: jax.Array):
        moved = se3.transform_points(delta, self.source.points)
        idx, sq, valid = knn_search(
            self.grid,
            moved,
            self.source.mask,
            k=1,
            num_neighbor_cells=self.num_neighbor_cells,
            max_points_per_cell=self.max_points_per_cell,
            max_sq_dist=self.max_corr_dist**2,
        )
        return idx[:, 0], valid[:, 0]

    def correspondences(self, poses: jax.Array):
        """1-NN search at `poses` -> (q [N,3], n [N,3]|None, valid [N]) — the
        payload cached between correspondence updates (reference:
        set_correspondence_update_tolerance, impl/integrated_icp_factor_impl.hpp:128-143)."""
        from gtsam_points_tpu.factors.base import factor_poses

        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        corr, valid = self._search(delta)
        q = self.target.points[jnp.maximum(corr, 0)]  # [N, 3]
        n = self.target.normals[jnp.maximum(corr, 0)] if self.point_to_plane else None
        return q, n, valid

    def linearize_corr(self, poses: jax.Array, corr):
        """Analytic linearization on a frozen correspondence set via the fused
        kernel (Pallas on TPU, planar XLA elsewhere): point-to-point is the
        W=I case, point-to-plane the W=nnᵀ rank-1 case of the same weighted
        form rᵀWr, r = delta·p - q."""
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops.pallas_linearize import error_fused, linearize_fused

        q, n, valid = corr
        N = q.shape[0]
        if self.point_to_plane:
            np_ = n.T  # [3, N]
            W6 = jnp.stack(
                [np_[0] * np_[0], np_[0] * np_[1], np_[0] * np_[2],
                 np_[1] * np_[1], np_[1] * np_[2], np_[2] * np_[2]]
            )
        else:
            one = jnp.ones((N,), jnp.float32)
            zero = jnp.zeros((N,), jnp.float32)
            W6 = jnp.stack([one, zero, zero, one, zero, one])
        pts_p = self.source.points.T
        q_p = q.T
        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        lin = linearize_fused(pts_p, q_p, W6, valid, delta)

        def err_fn(new_poses):
            nT_t, nT_s = factor_poses(self, new_poses)
            nd = se3.se3_inverse(nT_t) @ nT_s
            return error_fused(pts_p, q_p, W6, valid, nd)

        return lin, err_fn

    def residual_closure(self, T_t: jax.Array, T_s: jax.Array):
        delta = se3.se3_inverse(T_t) @ T_s
        corr, valid = self._search(delta)
        q = self.target.points[jnp.maximum(corr, 0)]  # [N, 3]
        if self.point_to_plane:
            n = self.target.normals[jnp.maximum(corr, 0)]

        def residual_fn(T_t_p, T_s_p):
            d = se3.se3_inverse(T_t_p) @ T_s_p
            moved = se3.transform_points(d, self.source.points)
            r = moved - q
            if self.point_to_plane:
                r = jnp.sum(r * n, axis=-1, keepdims=True)  # [N, 1]
            return r, None, valid

        return residual_fn


def make_icp_factor(
    target_key: int,
    source_key: int,
    target: Frame,
    source: Frame,
    point_to_plane: bool = False,
    max_corr_dist: float = 5.0,
    grid: Optional[HashGrid] = None,
    grid_leaf: float = 1.0,
    num_neighbor_cells: int = 27,
    max_points_per_cell: int = 16,
    fixed_target_pose: Optional[jax.Array] = None,
    coarse_factor: Optional[int] = None,
) -> ICPFactor:
    """Factory: builds the target grid if not supplied (the reference
    auto-builds a KdTree the same way, impl/integrated_icp_factor_impl.hpp:47-51).
    Pass coarse_factor (e.g. 4) for sparse maps where correspondences may lie
    several leaves away (max_corr_dist >> grid_leaf)."""
    if point_to_plane and target.normals is None:
        raise ValueError("point-to-plane ICP requires target normals")
    if grid is None:
        grid = build_hash_grid(
            target.points, target.mask, grid_leaf, coarse_factor=coarse_factor
        )
    if fixed_target_pose is None:
        fixed_target_pose = jnp.eye(4, dtype=jnp.float32)
    return ICPFactor(
        target=target,
        source=source,
        grid=grid,
        fixed_target_pose=fixed_target_pose,
        target_key=target_key,
        source_key=source_key,
        point_to_plane=point_to_plane,
        max_corr_dist=max_corr_dist,
        num_neighbor_cells=num_neighbor_cells,
        max_points_per_cell=max_points_per_cell,
    )


register_factor(
    ICPFactor,
    data_fields=["target", "source", "grid", "fixed_target_pose"],
    meta_fields=[
        "target_key",
        "source_key",
        "point_to_plane",
        "max_corr_dist",
        "num_neighbor_cells",
        "max_points_per_cell",
    ],
)
