"""Continuous-time ICP / GICP factors (CT-ICP).

Reference: IntegratedCT_ICPFactor / IntegratedCT_GICPFactor
(include/gtsam_points/factors/integrated_ct_icp_factor.hpp:21-98,
factors/impl/integrated_ct_icp_factor_impl.hpp:133-240). Two pose keys (scan
begin/end); each source point is deskewed at its timestamp by twist
interpolation T(t) = T0 · Exp(t · Log(T0⁻¹ T1)) before matching the target.
The reference hand-chains derivatives per unique timestamp; here the whole
interpolation chain differentiates by AD — a pure gather + Expmap, exactly the
shape TPUs like. The 12x12 two-key Hessian falls out of the same
linearize_residuals core.
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


def interpolate_poses(T0: jax.Array, T1: jax.Array, t: jax.Array) -> jax.Array:
    """Twist interpolation T(t) = T0 · Exp(t·Log(T0⁻¹T1)) for t [N] -> [N,4,4]."""
    xi = se3.se3_log(se3.se3_inverse(T0) @ T1)
    return T0 @ se3.se3_exp(t[:, None] * xi[None, :])


def deskew(T0: jax.Array, T1: jax.Array, frame: Frame) -> Frame:
    """Motion-compensate a frame to the scan-begin pose (reference:
    deskewed_source_points, integrated_ct_icp_factor.hpp)."""
    Ts = interpolate_poses(T0, T1, frame.times)
    rel = se3.se3_inverse(T0)[None] @ Ts
    pts = jnp.einsum("nij,nj->ni", rel[:, :3, :3], frame.points) + rel[:, :3, 3]
    return frame.replace(points=pts)


@dataclasses.dataclass(frozen=True)
class CTICPFactor(MatchingFactorMixin):
    """target_key = scan-begin pose, source_key = scan-end pose. Unary target
    mode is not meaningful here; both keys are always free."""

    target: Frame
    source: Frame  # must carry times normalized to [0, 1]
    grid: HashGrid
    target_key: int
    source_key: int
    max_corr_dist: float
    num_neighbor_cells: int
    max_points_per_cell: int
    gicp: bool
    point_to_plane: bool

    def residual_closure(self, T0, T1):
        times = self.source.times
        Ts = interpolate_poses(T0, T1, times)
        moved = jnp.einsum("nij,nj->ni", Ts[:, :3, :3], self.source.points) + Ts[:, :3, 3]
        idx, _, valid = knn_search(
            self.grid, moved, self.source.mask, k=1,
            num_neighbor_cells=self.num_neighbor_cells,
            max_points_per_cell=self.max_points_per_cell,
            max_sq_dist=self.max_corr_dist**2,
        )
        corr = jnp.maximum(idx[:, 0], 0)
        ok = valid[:, 0]
        q = self.target.points[corr]
        W = None
        n = None
        if self.gicp:
            C_t = self.target.covs[corr]
            Rts = Ts[:, :3, :3]
            fused = C_t + jnp.einsum("nij,njk,nlk->nil", Rts, self.source.covs, Rts)
            W = inv3x3(fused)
        elif self.point_to_plane:
            n = self.target.normals[corr]

        def residual_fn(T0p, T1p):
            Tsp = interpolate_poses(T0p, T1p, times)
            p = jnp.einsum("nij,nj->ni", Tsp[:, :3, :3], self.source.points) + Tsp[:, :3, 3]
            r = p - q
            if n is not None:
                r = jnp.sum(r * n, axis=-1, keepdims=True)
            return r, W, ok

        return residual_fn


def make_ct_icp_factor(
    begin_key: int,
    end_key: int,
    target: Frame,
    source: Frame,
    gicp: bool = False,
    point_to_plane: bool = False,
    max_corr_dist: float = 2.0,
    grid: Optional[HashGrid] = None,
    grid_leaf: float = 1.0,
    num_neighbor_cells: int = 27,
    max_points_per_cell: int = 16,
) -> CTICPFactor:
    if source.times is None:
        raise ValueError("CT-ICP requires per-point times on the source frame")
    if gicp and (target.covs is None or source.covs is None):
        raise ValueError("CT-GICP requires covariances on both frames")
    if point_to_plane and target.normals is None:
        raise ValueError("point-to-plane CT-ICP requires target normals")
    # normalize times to [0, 1]
    tmin = jnp.min(jnp.where(source.mask, source.times, jnp.inf))
    tmax = jnp.max(jnp.where(source.mask, source.times, -jnp.inf))
    tnorm = (source.times - tmin) / jnp.maximum(tmax - tmin, 1e-9)
    source = source.replace(times=jnp.where(source.mask, tnorm, 0.0))
    if grid is None:
        grid = build_hash_grid(target.points, target.mask, grid_leaf)
    return CTICPFactor(
        target=target,
        source=source,
        grid=grid,
        target_key=begin_key,
        source_key=end_key,
        max_corr_dist=max_corr_dist,
        num_neighbor_cells=num_neighbor_cells,
        max_points_per_cell=max_points_per_cell,
        gicp=gicp,
        point_to_plane=point_to_plane,
    )


register_factor(
    CTICPFactor,
    data_fields=["target", "source", "grid"],
    meta_fields=[
        "target_key",
        "source_key",
        "max_corr_dist",
        "num_neighbor_cells",
        "max_points_per_cell",
        "gicp",
        "point_to_plane",
    ],
)
