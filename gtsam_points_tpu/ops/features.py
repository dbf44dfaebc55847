"""Per-point covariance / normal estimation (reference:
include/gtsam_points/features/covariance_estimation.hpp:16-59,
features/normal_estimation.hpp:13-48).

TPU design: one grid-kNN pass produces [N, k] neighbor indices; covariances are
batched 3x3 scatter matrices; eigenvalue regularization uses a batched
closed-form symmetric 3x3 eigendecomposition (no LAPACK loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.eigh3 import eigh3
from gtsam_points_tpu.ops.hash_grid import HashGrid, build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame


def neighbor_covariances(points: jax.Array, nn_idx: jax.Array, nn_valid: jax.Array):
    """[N,3] points, [N,k] neighbor indices -> ([N,3,3] scatter covs, [N,3] means)."""
    nbr = points[jnp.maximum(nn_idx, 0)]  # [N, k, 3]
    w = nn_valid.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nbr * w, axis=1) / cnt
    diff = (nbr - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", diff, diff) / cnt[..., None]
    return cov, mean


def regularize_covariances(covs: jax.Array, mode: str = "eig"):
    """Eigenvalue regularization: project eigenvalues to [1e-3, 1, 1]
    (reference: CovarianceEstimationParams::RegularizationMethod::EIG,
    src/gtsam_points/features/covariance_estimation.cpp)."""
    if mode == "none":
        return covs
    eigvals, eigvecs = eigh3(covs)
    target = jnp.asarray([1e-3, 1.0, 1.0], dtype=covs.dtype)
    return jnp.einsum("nij,j,nkj->nik", eigvecs, target, eigvecs)


def estimate_normals_covs(
    frame: Frame,
    k: int = 10,
    grid: HashGrid | None = None,
    grid_leaf: float = 0.5,
    num_neighbor_cells: int = 27,
    max_points_per_cell: int = 16,
    regularization: str = "eig",
    view_point: jax.Array | None = None,
) -> Frame:
    """Estimate normals + regularized covariances in one kNN pass (the fused
    path the reference exposes as estimate_normals_covs). Normals are oriented
    toward `view_point` (default origin = sensor), matching the reference's
    viewpoint sign disambiguation."""
    if grid is None:
        grid = build_hash_grid(frame.points, frame.mask, grid_leaf)
    nn_idx, _, nn_valid = knn_search(
        grid, frame.points, frame.mask, k, num_neighbor_cells, max_points_per_cell
    )
    raw_cov, _ = neighbor_covariances(frame.points, nn_idx, nn_valid)
    eigvals, eigvecs = eigh3(raw_cov)  # ascending
    normals = eigvecs[..., 0]  # smallest-eigenvalue eigenvector
    vp = jnp.zeros((3,), dtype=frame.points.dtype) if view_point is None else view_point
    to_vp = vp[None, :] - frame.points
    sign = jnp.where(jnp.sum(normals * to_vp, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    normals = normals * sign

    if regularization == "eig":
        target = jnp.asarray([1e-3, 1.0, 1.0], dtype=raw_cov.dtype)
        covs = jnp.einsum("nij,j,nkj->nik", eigvecs, target, eigvecs)
    else:
        covs = raw_cov
    return frame.replace(normals=normals, covs=covs)


def estimate_covariances(frame: Frame, k: int = 10, **kwargs) -> Frame:
    out = estimate_normals_covs(frame, k=k, **kwargs)
    return frame.replace(covs=out.covs)


def estimate_normals(frame: Frame, k: int = 10, **kwargs) -> Frame:
    out = estimate_normals_covs(frame, k=k, **kwargs)
    return frame.replace(normals=out.normals)
