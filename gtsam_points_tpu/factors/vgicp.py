"""VGICP: voxelized GICP against a Gaussian voxel map.

Reference: IntegratedVGICPFactor / IntegratedVGICPFactorGPU
(include/gtsam_points/factors/integrated_vgicp_factor.hpp,
factors/impl/integrated_vgicp_factor_impl.hpp:114-257,
cuda/kernels/vgicp_derivatives.cuh:16-87). Correspondence is an O(1) voxel
lookup of each source point in the target GaussianVoxelMap; the cost is GICP
D2D against the voxel mean/cov. The whole
(lookup + residual + Jacobian + reduction) evaluates as one fused XLA program —
the TPU analogue of the reference's fused transform-iterator + cub reduction
(src/gtsam_points/cuda/integrated_vgicp_derivatives_linearize.cu:24-57).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import MatchingFactorMixin, register_factor
from gtsam_points_tpu.factors.linearized import inv3x3
from gtsam_points_tpu.ops.voxelmap import GaussianVoxelMap, build_voxelmap, lookup_voxels
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3


@dataclasses.dataclass(frozen=True)
class VGICPFactor(MatchingFactorMixin):
    voxelmap: GaussianVoxelMap
    source: Frame
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    min_voxel_points: float

    def _source_planar(self):
        """(points [3,N], covs6 [6,N] or None) — planar source views."""
        pts_p = self.source.points.T
        if self.source.covs is not None:
            c = self.source.covs
            covs6 = jnp.stack([c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]])
        else:
            covs6 = None
        return pts_p, covs6

    def correspondences(self, poses: jax.Array):
        """Voxel lookup + fused mahalanobis weights at `poses` (the expensive
        probe). -> (found [N], mu [3,N], W6 [6,N]) — the exact payload the
        reference caches between correspondence updates (FULL fused-cov cache,
        impl/integrated_gicp_factor_impl.hpp:151-296; inlier recompute gate,
        cuda/kernels/integrated_vgicp_derivatives.cuh:30-34)."""
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops import planar
        from gtsam_points_tpu.ops.voxelmap import lookup_fetch_planar

        T_t, T_s = factor_poses(self, poses)
        pts_p, covs6 = self._source_planar()
        delta = se3.se3_inverse(T_t) @ T_s
        pm = planar.transform(delta, pts_p)
        found, count, mu, C6 = lookup_fetch_planar(self.voxelmap, pm, self.source.mask)
        found = found & (count >= self.min_voxel_points)
        if covs6 is not None:
            fused = C6 + planar.sym_rotate(delta[:3, :3], covs6)
        else:
            eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], C6.dtype) * 1e-3
            fused = C6 + eye6[:, None]
        W6 = planar.sym_inv(fused)
        return found, mu, W6

    def linearize_corr(self, poses: jax.Array, corr):
        """Analytic linearization on a frozen correspondence set — one fused
        Pallas kernel on TPU (ops/pallas_linearize.py), planar XLA elsewhere;
        no probe."""
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops.pallas_linearize import error_fused, linearize_fused

        found, mu, W6 = corr
        pts_p, _ = self._source_planar()
        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        lin = linearize_fused(pts_p, mu, W6, found, delta)

        def err_fn(new_poses):
            nT_t, nT_s = factor_poses(self, new_poses)
            nd = se3.se3_inverse(nT_t) @ nT_s
            return error_fused(pts_p, mu, W6, found, nd)

        return lin, err_fn

    def linearize(self, poses: jax.Array):
        lin, _ = self.linearize_corr(poses, self.correspondences(poses))
        return lin

    def linearize_with_error_fn(self, poses: jax.Array):
        return self.linearize_corr(poses, self.correspondences(poses))

    def error(self, poses: jax.Array):
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops import planar

        found, mu, W6 = self.correspondences(poses)
        pts_p, _ = self._source_planar()
        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        pm = planar.transform(delta, pts_p)
        return planar.weighted_error(pm - mu, W6, found)

    def residual_closure(self, T_t: jax.Array, T_s: jax.Array):
        """AD-path closure (kept as the reference implementation the planar
        fast path is verified against; see tests/test_planar.py)."""
        from gtsam_points_tpu.ops.voxelmap import lookup_fetch

        delta = se3.se3_inverse(T_t) @ T_s
        moved = se3.transform_points(delta, self.source.points)
        found, count, mu, C_t = lookup_fetch(self.voxelmap, moved, self.source.mask)
        found = found & (count >= self.min_voxel_points)
        R = delta[:3, :3]
        if self.source.covs is not None:
            fused = C_t + jnp.einsum("ij,njk,lk->nil", R, self.source.covs, R)
        else:
            fused = C_t + 1e-3 * jnp.eye(3, dtype=C_t.dtype)
        W = inv3x3(fused)

        def residual_fn(T_t_p, T_s_p):
            d = se3.se3_inverse(T_t_p) @ T_s_p
            r = se3.transform_points(d, self.source.points) - mu
            return r, W, found

        return residual_fn


def make_vgicp_factor(
    target_key: int,
    source_key: int,
    target,
    source: Frame,
    voxel_resolution: float = 1.0,
    min_voxel_points: float = 5.0,
    fixed_target_pose: Optional[jax.Array] = None,
) -> VGICPFactor:
    """`target` may be a Frame (voxelmap built here) or a GaussianVoxelMap."""
    if isinstance(target, GaussianVoxelMap):
        vmap = target
    else:
        vmap = build_voxelmap(target, voxel_resolution)
    if fixed_target_pose is None:
        fixed_target_pose = jnp.eye(4, dtype=jnp.float32)
    return VGICPFactor(
        voxelmap=vmap,
        source=source,
        fixed_target_pose=fixed_target_pose,
        target_key=target_key,
        source_key=source_key,
        min_voxel_points=min_voxel_points,
    )


register_factor(
    VGICPFactor,
    data_fields=["voxelmap", "source", "fixed_target_pose"],
    meta_fields=["target_key", "source_key", "min_voxel_points"],
)


@dataclasses.dataclass(frozen=True)
class VGICPClustersFactor(MatchingFactorMixin):
    """VGICP whose SOURCE is a pre-clustered scan (registration/cluster.py
    SourceClusters): correspondence is one probe of ~5k weighted cluster
    records instead of 25k points, and the linearize/error are the weighted
    unary path — the single-stream latency analogue of the batched cluster
    pyramid (the LM loop probes per outer iteration and error-evals per
    lambda candidate, so the 5x probe/eval shrink compounds).

    Source-block-only (the target pose must be FIXED: target_key = -1 with
    fixed_target_pose, the scan-to-map odometry shape — reference analogue:
    the unary use of IntegratedVGICPFactor in scan-to-map odometry,
    example/advanced_scan_matching.cpp). `clusters` carry exact raw moments;
    `eps` regularizes their covariance diagonal exactly as
    register_clusters_pyramid does."""

    voxelmap: GaussianVoxelMap
    clusters: object  # registration.cluster.SourceClusters
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    min_voxel_points: float
    eps: float = 1e-3

    def _cl_covs6(self):
        eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], jnp.float32) * self.eps
        return self.clusters.covs6 + eye6[:, None]

    def correspondences(self, poses: jax.Array):
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops.pallas_linearize import probe_moments

        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        momT, found = probe_moments(
            self.voxelmap, self.clusters.pts_p, self.clusters.mask, delta
        )
        return momT, found

    def linearize_corr(self, poses: jax.Array, corr):
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops.pallas_linearize import (
            linearize_vgicp_unary_xla,
            vgicp_unary_error_xla,
        )

        momT, found = corr
        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        covs6 = self._cl_covs6()
        lin = linearize_vgicp_unary_xla(
            self.clusters.pts_p, momT, found, delta, self.min_voxel_points,
            src_covs6=covs6, weights=self.clusters.weight,
        )

        def err_fn(new_poses):
            nT_t, nT_s = factor_poses(self, new_poses)
            nd = se3.se3_inverse(nT_t) @ nT_s
            err, _ = vgicp_unary_error_xla(
                self.clusters.pts_p, momT, found, nd, self.min_voxel_points,
                src_covs6=covs6, weights=self.clusters.weight,
            )
            return err

        return lin, err_fn

    def linearize(self, poses: jax.Array):
        lin, _ = self.linearize_corr(poses, self.correspondences(poses))
        return lin

    def linearize_with_error_fn(self, poses: jax.Array):
        return self.linearize_corr(poses, self.correspondences(poses))

    def error(self, poses: jax.Array):
        from gtsam_points_tpu.factors.base import factor_poses
        from gtsam_points_tpu.ops.pallas_linearize import vgicp_unary_error_xla

        momT, found = self.correspondences(poses)
        T_t, T_s = factor_poses(self, poses)
        delta = se3.se3_inverse(T_t) @ T_s
        err, _ = vgicp_unary_error_xla(
            self.clusters.pts_p, momT, found, delta, self.min_voxel_points,
            src_covs6=self._cl_covs6(), weights=self.clusters.weight,
        )
        return err


def make_vgicp_clusters_factor(
    target_key: int,
    source_key: int,
    target,
    clusters,
    voxel_resolution: float = 1.0,
    min_voxel_points: float = 5.0,
    fixed_target_pose: Optional[jax.Array] = None,
) -> VGICPClustersFactor:
    """`target` may be a Frame (voxelmap built here) or a GaussianVoxelMap;
    `clusters` from registration.cluster.cluster_source (sensor frame)."""
    if isinstance(target, GaussianVoxelMap):
        vmap = target
    else:
        vmap = build_voxelmap(target, voxel_resolution)
    if fixed_target_pose is None:
        fixed_target_pose = jnp.eye(4, dtype=jnp.float32)
    return VGICPClustersFactor(
        voxelmap=vmap,
        clusters=clusters,
        fixed_target_pose=fixed_target_pose,
        target_key=target_key,
        source_key=source_key,
        min_voxel_points=min_voxel_points,
    )


register_factor(
    VGICPClustersFactor,
    data_fields=["voxelmap", "clusters", "fixed_target_pose"],
    meta_fields=["target_key", "source_key", "min_voxel_points", "eps"],
)
