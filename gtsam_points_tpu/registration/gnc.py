"""Graduated non-convexity global registration (fast global registration).

Reference: estimate_pose_gnc (include/gtsam_points/registration/graduated_non_convexity.hpp:16-60,
registration/impl/graduated_non_convexity_impl.hpp:40-203; Zhou ECCV2016):
reciprocal FPFH matching, optional tuple length-similarity check, then
Geman-McClure IRLS with a mu schedule starting at the target diameter and
divided by div_factor each outer iteration; inner loop = weighted closed-form
alignment. All fixed-shape: the IRLS loop is a lax.fori_loop over batched
correspondence arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.registration.alignment import align_points_4dof, align_points_se3
from gtsam_points_tpu.registration.fpfh import feature_knn
from gtsam_points_tpu.registration.ransac import RegistrationResult, build_hash_grid, overlap_score
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3


@dataclasses.dataclass(frozen=True)
class GNCParams:
    max_iterations: int = 64
    div_factor: float = 1.4
    max_corr_dist: float = 0.25  # final mu floor (squared in weight)
    dof: int = 6
    reciprocal: bool = True
    inlier_voxel_resolution: float = 1.0


def estimate_pose_gnc(
    target: Frame,
    source: Frame,
    target_features: jax.Array,
    source_features: jax.Array,
    params: Optional[GNCParams] = None,
) -> RegistrationResult:
    params = params or GNCParams()

    # matches source -> target
    st_idx, _, st_valid = feature_knn(target_features, target.mask, source_features, source.mask)
    st_idx, st_valid = st_idx[:, 0], st_valid[:, 0]
    if params.reciprocal:
        ts_idx, _, ts_valid = feature_knn(source_features, source.mask, target_features, target.mask)
        ts_idx = ts_idx[:, 0]
        back = ts_idx[jnp.maximum(st_idx, 0)]
        st_valid = st_valid & (back == jnp.arange(source.capacity))

    src = source.points
    tgt = target.points[jnp.maximum(st_idx, 0)]
    valid = st_valid & source.mask

    # mu schedule from target diameter (reference: mu init = diameter^2)
    lo = jnp.min(jnp.where(target.mask[:, None], target.points, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(target.mask[:, None], target.points, -jnp.inf), axis=0)
    diameter = jnp.linalg.norm(hi - lo)
    mu0 = diameter * diameter

    align = align_points_se3 if params.dof == 6 else align_points_4dof

    def body(i, carry):
        T, mu = carry
        moved = se3.transform_points(T, src)
        sq = jnp.sum((moved - tgt) ** 2, axis=-1)
        # Geman-McClure IRLS weight: (mu / (mu + r^2))^2
        w = jnp.where(valid, (mu / (mu + sq)) ** 2, 0.0)
        T_new = align(src, tgt, w)
        mu_new = jnp.maximum(mu / params.div_factor, params.max_corr_dist**2)
        return (T_new, mu_new)

    T0 = jnp.eye(4, dtype=jnp.float32)
    T_f, _ = jax.lax.fori_loop(0, params.max_iterations, body, (T0, mu0))

    occ = build_hash_grid(target.points, target.mask, params.inlier_voxel_resolution)
    score = overlap_score(occ, T_f, source.points, source.mask)
    return RegistrationResult(T_target_source=T_f, inlier_rate=score)
