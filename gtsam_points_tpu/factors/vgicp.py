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

    def residual_closure(self, T_t: jax.Array, T_s: jax.Array):
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
