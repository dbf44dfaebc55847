"""Feature-matched RANSAC global registration.

Reference: estimate_pose_ransac
(include/gtsam_points/registration/ransac.hpp:17-110,
registration/impl/ransac_impl.hpp:24-193): sample 3 source points, match in
FPFH space, polygonal-length prerejection (Buch ICRA2013), closed-form align,
score by occupancy-grid overlap, early-stop at high inlier rate.

TPU design: ALL hypotheses evaluate in one vmapped batch — sampling, prerejection,
SVD alignment, and the overlap scoring are each one batched op over the
hypothesis axis (replacing the OpenMP loop over iterations). The occupancy
grid is the sorted-key hash grid (stands in for FastOccupancyGrid,
ann/fast_occupancy_grid.hpp:51-120).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.hash_grid import HashGrid, build_hash_grid, lookup_cells
from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.registration.alignment import align_points_4dof, align_points_se3
from gtsam_points_tpu.registration.fpfh import feature_knn
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3


@dataclasses.dataclass(frozen=True)
class RANSACParams:
    max_iterations: int = 4096  # hypothesis count (all evaluated in parallel)
    poly_error_thresh: float = 0.3  # prerejection side-length similarity
    inlier_voxel_resolution: float = 1.0
    dof: int = 6  # 6 or 4 (gravity-aligned)
    seed: int = 0
    num_overlap_samples: int = 1024  # source points used for final overlap scoring
    # two-stage scoring: every hypothesis is scored on a coarse sample, only
    # the best `rescore_top` are rescored on the full sample — the batched
    # analogue of the reference's early-stop at high inlier rate
    # (registration/impl/ransac_impl.hpp:120-185). Hash probes drop ~8x.
    coarse_overlap_samples: int = 128
    rescore_top: int = 128
    # taboo list: known-bad poses to exclude (reference ransac.hpp:26-28,
    # impl/ransac_impl.hpp:149-155): a hypothesis within BOTH thresholds of
    # any taboo pose is rejected before scoring. Set via the `taboo` arg of
    # estimate_pose_ransac (an [M,4,4] array — vmapped proximity mask).
    taboo_thresh_rot: float = 0.5 * 3.14159265 / 180.0
    taboo_thresh_trans: float = 0.25


class RegistrationResult(NamedTuple):
    T_target_source: jax.Array  # [4, 4]
    inlier_rate: jax.Array  # ()


def overlap_score(grid: HashGrid, T: jax.Array, pts: jax.Array, mask: jax.Array) -> jax.Array:
    """Fraction of transformed points landing in occupied cells; batched over
    leading dims of T."""
    moved = se3.transform_points(T, pts)
    keys = vk.pack_coords(vk.voxel_coords(moved, 1.0 / grid.leaf))
    keys = jnp.where(mask, keys, vk.INVALID_KEY)
    _, found = lookup_cells(grid, keys)
    return jnp.sum(found, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1)


def estimate_pose_ransac(
    target: Frame,
    source: Frame,
    target_features: jax.Array,
    source_features: jax.Array,
    params: Optional[RANSACParams] = None,
    key: Optional[jax.Array] = None,
    taboo: Optional[jax.Array] = None,
) -> RegistrationResult:
    """`taboo` [M, 4, 4]: previously-found bad poses; hypotheses within
    params.taboo_thresh_rot AND taboo_thresh_trans of any of them are
    excluded (reference: re-running RANSAC after a failed verification
    without re-finding the same wrong pose, ransac_impl.hpp:149-155)."""
    params = params or RANSACParams()
    if key is None:
        key = jax.random.PRNGKey(params.seed)

    # 1-NN of every source feature in target feature space (once, shared by all hypotheses)
    match_idx, _, match_valid = feature_knn(target_features, target.mask, source_features, source.mask)
    match_idx = match_idx[:, 0]
    match_valid = match_valid[:, 0]

    occ = build_hash_grid(target.points, target.mask, params.inlier_voxel_resolution)

    n_src = source.capacity
    k_sample, k_overlap = jax.random.split(key)
    # subsample source points for overlap scoring (constant per run)
    score_idx = jax.random.randint(k_overlap, (params.num_overlap_samples,), 0, n_src)
    score_pts = source.points[score_idx]
    score_mask = source.mask[score_idx]

    # hypothesis sampling: 3 matched source points each
    cand = jax.random.randint(k_sample, (params.max_iterations, 3), 0, n_src)
    s_pts = source.points[cand]  # [H, 3, 3]
    t_pts = target.points[jnp.maximum(match_idx[cand], 0)]  # [H, 3, 3]
    h_valid = jnp.all(match_valid[cand], axis=-1)

    # polygonal prerejection: side lengths similar (reference: ransac_impl.hpp:72-89)
    def side_lengths(p):
        return jnp.stack(
            [
                jnp.linalg.norm(p[..., 0, :] - p[..., 1, :], axis=-1),
                jnp.linalg.norm(p[..., 1, :] - p[..., 2, :], axis=-1),
                jnp.linalg.norm(p[..., 2, :] - p[..., 0, :], axis=-1),
            ],
            axis=-1,
        )

    ls, lt = side_lengths(s_pts), side_lengths(t_pts)
    poly_ok = jnp.all(
        jnp.abs(ls - lt) / jnp.maximum(jnp.maximum(ls, lt), 1e-6) < params.poly_error_thresh, axis=-1
    )
    h_valid = h_valid & poly_ok & (jnp.min(ls, axis=-1) > 1e-3)

    align = align_points_se3 if params.dof == 6 else align_points_4dof
    T_h = align(s_pts, t_pts)  # [H, 4, 4]

    if taboo is not None and taboo.shape[0] > 0:
        def near_any(T):
            def near_one(Tt):
                rot_e, trans_e = se3.pose_error(T, Tt)
                return (rot_e < params.taboo_thresh_rot) & (
                    trans_e < params.taboo_thresh_trans
                )

            return jnp.any(jax.vmap(near_one)(taboo))

        h_valid = h_valid & ~jax.vmap(near_any)(T_h)

    # stage 1: coarse score of ALL hypotheses on a small sample
    nc = min(params.coarse_overlap_samples, params.num_overlap_samples)
    coarse = overlap_score(occ, T_h, score_pts[None, :nc], score_mask[None, :nc])  # [H]
    coarse = jnp.where(h_valid, coarse, -1.0)

    top = min(params.rescore_top, params.max_iterations)
    if top < params.max_iterations:
        # stage 2: rescore only the best `top` on the full sample
        _, ti = jax.lax.top_k(coarse, top)
        T_t = T_h[ti]  # [top, 4, 4]
        scores = overlap_score(occ, T_t, score_pts[None], score_mask[None])  # [top]
        scores = jnp.where(coarse[ti] > -1.0, scores, -1.0)
        best = jnp.argmax(scores)
        return RegistrationResult(T_target_source=T_t[best], inlier_rate=scores[best])

    best = jnp.argmax(coarse)
    return RegistrationResult(T_target_source=T_h[best], inlier_rate=coarse[best])
