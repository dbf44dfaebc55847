"""LOAM-style edge + plane matching-cost factors.

Reference: IntegratedLOAMFactor / IntegratedPointToEdgeFactor /
IntegratedPointToPlaneFactor (include/gtsam_points/factors/integrated_loam_factor.hpp:30-217,
factors/impl/integrated_loam_factor_impl.hpp:234-279). Edge points match 2-NN
in the target edge cloud (point-to-line distance); plane points match 3-NN in
the target plane cloud (point-to-3pt-plane distance). Both run as batched grid
kNN + AD-linearized residuals here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import MatchingFactorMixin, register_factor
from gtsam_points_tpu.factors.linearized import Linearized
from gtsam_points_tpu.ops.hash_grid import HashGrid, build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3

_EPS = 1e-6
# scan-line separation threshold: 0.1 degrees of vertical angle (reference:
# impl/integrated_loam_factor_impl.hpp:487-530 validate_correspondences)
_SAME_SCAN_LINE = 0.1 * jnp.pi / 180.0


def _vertical_angle(p: jax.Array) -> jax.Array:
    """Vertical (elevation) angle of each point — the proxy for its LiDAR
    scan line: atan2(z, |xy|)."""
    return jnp.arctan2(p[..., 2], jnp.linalg.norm(p[..., :2], axis=-1))


@dataclasses.dataclass(frozen=True)
class PointToEdgeFactor(MatchingFactorMixin):
    """Point-to-line: r = (p - a) x d / |d|, with (a, b) the 2-NN edge points
    and d = b - a (reference: impl/integrated_loam_factor_impl.hpp point-to-edge).

    validate_scan_lines rejects correspondences whose two neighbors lie on the
    same scan line (a degenerate edge; reference validate_correspondences hook,
    integrated_loam_factor.hpp:77-81)."""

    target: Frame
    source: Frame
    grid: HashGrid
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    max_corr_dist: float
    num_neighbor_cells: int
    max_points_per_cell: int
    validate_scan_lines: bool = False

    def residual_closure(self, T_t, T_s):
        delta = se3.se3_inverse(T_t) @ T_s
        moved = se3.transform_points(delta, self.source.points)
        idx, _, valid = knn_search(
            self.grid, moved, self.source.mask, k=2,
            num_neighbor_cells=self.num_neighbor_cells,
            max_points_per_cell=self.max_points_per_cell,
            max_sq_dist=self.max_corr_dist**2,
        )
        ok = valid[:, 0] & valid[:, 1]
        a = self.target.points[jnp.maximum(idx[:, 0], 0)]
        b = self.target.points[jnp.maximum(idx[:, 1], 0)]
        if self.validate_scan_lines:
            ok = ok & (jnp.abs(_vertical_angle(a) - _vertical_angle(b)) >= _SAME_SCAN_LINE)
        d = b - a
        dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
        ok = ok & (dn[:, 0] > _EPS)
        d_unit = d / jnp.maximum(dn, _EPS)

        def residual_fn(T_t_p, T_s_p):
            dd = se3.se3_inverse(T_t_p) @ T_s_p
            p = se3.transform_points(dd, self.source.points)
            r = jnp.cross(p - a, d_unit)
            return r, None, ok

        return residual_fn


@dataclasses.dataclass(frozen=True)
class PointToPlaneLOAMFactor(MatchingFactorMixin):
    """Point-to-3pt-plane: r = n·(p - a)/|n|, n = (b-a)x(c-a), with (a,b,c)
    the 3-NN plane points.

    validate_scan_lines rejects correspondences whose three neighbors all lie
    on one scan line (reference validate_correspondences hook,
    integrated_loam_factor.hpp:77-81)."""

    target: Frame
    source: Frame
    grid: HashGrid
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    max_corr_dist: float
    num_neighbor_cells: int
    max_points_per_cell: int
    validate_scan_lines: bool = False

    def residual_closure(self, T_t, T_s):
        delta = se3.se3_inverse(T_t) @ T_s
        moved = se3.transform_points(delta, self.source.points)
        idx, _, valid = knn_search(
            self.grid, moved, self.source.mask, k=3,
            num_neighbor_cells=self.num_neighbor_cells,
            max_points_per_cell=self.max_points_per_cell,
            max_sq_dist=self.max_corr_dist**2,
        )
        ok = valid[:, 0] & valid[:, 1] & valid[:, 2]
        a = self.target.points[jnp.maximum(idx[:, 0], 0)]
        b = self.target.points[jnp.maximum(idx[:, 1], 0)]
        c = self.target.points[jnp.maximum(idx[:, 2], 0)]
        if self.validate_scan_lines:
            va, vb, vc = _vertical_angle(a), _vertical_angle(b), _vertical_angle(c)
            same = (jnp.abs(va - vb) < _SAME_SCAN_LINE) & (jnp.abs(va - vc) < _SAME_SCAN_LINE)
            ok = ok & jnp.logical_not(same)
        n = jnp.cross(b - a, c - a)
        nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
        ok = ok & (nn[:, 0] > _EPS)
        n_unit = n / jnp.maximum(nn, _EPS)

        def residual_fn(T_t_p, T_s_p):
            dd = se3.se3_inverse(T_t_p) @ T_s_p
            p = se3.transform_points(dd, self.source.points)
            r = jnp.sum((p - a) * n_unit, axis=-1, keepdims=True)
            return r, None, ok

        return residual_fn


@dataclasses.dataclass(frozen=True)
class LOAMFactor:
    """Combined edge + plane LOAM factor (reference: IntegratedLOAMFactor
    bundles both costs over separate edge/plane clouds)."""

    edge: PointToEdgeFactor
    plane: PointToPlaneLOAMFactor
    target_key: int
    source_key: int

    @property
    def keys(self):
        return (self.target_key, self.source_key)

    def linearize(self, poses) -> Linearized:
        le = self.edge.linearize(poses)
        lp = self.plane.linearize(poses)
        return Linearized(*[a + b for a, b in zip(le, lp)])

    def error(self, poses):
        return self.edge.error(poses) + self.plane.error(poses)


def make_loam_factor(
    target_key: int,
    source_key: int,
    target_edges: Frame,
    target_planes: Frame,
    source_edges: Frame,
    source_planes: Frame,
    max_corr_dist: float = 2.0,
    grid_leaf: float = 1.0,
    num_neighbor_cells: int = 27,
    max_points_per_cell: int = 16,
    fixed_target_pose: Optional[jax.Array] = None,
    enable_correspondence_validation: bool = False,
) -> LOAMFactor:
    """`enable_correspondence_validation` mirrors the reference's
    set_enable_correspondence_validation (scan-line rejection,
    integrated_loam_factor.hpp:64, :77-81)."""
    if fixed_target_pose is None:
        fixed_target_pose = jnp.eye(4, dtype=jnp.float32)
    edge = PointToEdgeFactor(
        target=target_edges,
        source=source_edges,
        grid=build_hash_grid(target_edges.points, target_edges.mask, grid_leaf),
        fixed_target_pose=fixed_target_pose,
        target_key=target_key,
        source_key=source_key,
        max_corr_dist=max_corr_dist,
        num_neighbor_cells=num_neighbor_cells,
        max_points_per_cell=max_points_per_cell,
        validate_scan_lines=enable_correspondence_validation,
    )
    plane = PointToPlaneLOAMFactor(
        target=target_planes,
        source=source_planes,
        grid=build_hash_grid(target_planes.points, target_planes.mask, grid_leaf),
        fixed_target_pose=fixed_target_pose,
        target_key=target_key,
        source_key=source_key,
        max_corr_dist=max_corr_dist,
        num_neighbor_cells=num_neighbor_cells,
        max_points_per_cell=max_points_per_cell,
        validate_scan_lines=enable_correspondence_validation,
    )
    return LOAMFactor(edge=edge, plane=plane, target_key=target_key, source_key=source_key)


_loam_fields = ["target", "source", "grid", "fixed_target_pose"]
_loam_meta = ["target_key", "source_key", "max_corr_dist", "num_neighbor_cells", "max_points_per_cell", "validate_scan_lines"]
register_factor(PointToEdgeFactor, data_fields=_loam_fields, meta_fields=_loam_meta)
register_factor(PointToPlaneLOAMFactor, data_fields=_loam_fields, meta_fields=_loam_meta)
register_factor(LOAMFactor, data_fields=["edge", "plane"], meta_fields=["target_key", "source_key"])
