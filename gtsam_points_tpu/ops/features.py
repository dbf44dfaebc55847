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
    viewpoint sign disambiguation.

    PREPROCESSING DEFAULT (round 5): prefer estimate_normals_covs_moments —
    ~2x faster on TPU (segment sums + one per-cell eigh instead of per-point
    kNN gathers) and registration-accuracy-par on the kitti_07 protocol
    (bench_suite covariance_path_accuracy_parity row; also
    tests/test_data_convergence.py::test_kitti07_gicp_graph_moments_covs).
    Use this kNN path when per-point fidelity of the covariances themselves
    matters (e.g. feature extraction research), not for registration
    preprocessing."""
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


def estimate_normals_covs_moments(
    frame: Frame,
    leaf: float = 1.0,
    num_neighbor_cells: int = 7,
    regularization: str = "eig",
    view_point: jax.Array | None = None,
) -> Frame:
    """Moments-based normals/covariances — the TPU-native fast path.

    Instead of per-point kNN (whose random gathers are HBM-latency-bound on
    TPU), accumulate per-VOXEL Gaussian moments with segment sums, blend each
    cell with its face-neighbor cells' moments, eigendecompose once per CELL,
    and give every point its cell's normal/cov with one row gather. This is
    the reference's IncrementalCovarianceVoxelMap idea (voxel-local statistics
    instead of a tree query; include/gtsam_points/ann/
    incremental_covariance_voxelmap.hpp:13-82) applied to batch estimation.
    ~6x faster than the kNN path at 16k points; GICP accuracy is equivalent
    because the eigenvalue regularization [1e-3, 1, 1] only keeps the plane
    orientation anyway (tests/test_data_convergence.py runs both)."""
    from gtsam_points_tpu.ops import voxel_keys as vk
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap, lookup_rows

    vmap = build_voxelmap(frame, leaf)

    # blend each cell's moments with its neighbors (moment sums are additive)
    offs = vk.neighbor_offsets(num_neighbor_cells)
    cell_coords = vk.unpack_key(vmap.keys)
    nb_keys = vk.pack_coords(cell_coords[:, None, :] + offs[None, :, :])
    nb_keys = jnp.where((vmap.keys != vk.INVALID_KEY)[:, None], nb_keys, vk.INVALID_KEY)
    nb_rows, nb_found = lookup_rows(vmap, nb_keys)  # [C, O]
    nb_mom = vmap.moments[jnp.where(nb_found, nb_rows, 0)]  # [C, O, 16]
    blended = jnp.sum(nb_mom * nb_found[..., None], axis=1)  # [C, 16]

    cnt = jnp.maximum(blended[:, 0], 1.0)
    mu = blended[:, 1:4] / cnt[:, None]
    s = blended[:, 4:10] / cnt[:, None]
    xx = s[:, 0] - mu[:, 0] * mu[:, 0]
    xy = s[:, 1] - mu[:, 0] * mu[:, 1]
    xz = s[:, 2] - mu[:, 0] * mu[:, 2]
    yy = s[:, 3] - mu[:, 1] * mu[:, 1]
    yz = s[:, 4] - mu[:, 1] * mu[:, 2]
    zz = s[:, 5] - mu[:, 2] * mu[:, 2]
    cell_cov = jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )  # [C, 3, 3]

    eigvals, eigvecs = eigh3(cell_cov)
    cell_normals = eigvecs[..., 0]
    if regularization == "eig":
        target = jnp.asarray([1e-3, 1.0, 1.0], dtype=cell_cov.dtype)
        cell_cov = jnp.einsum("nij,j,nkj->nik", eigvecs, target, eigvecs)

    # per point: one probe + row gathers of its cell's normal/cov
    keys = vk.point_keys(frame.points, frame.mask, leaf)
    row, found = lookup_rows(vmap, keys)
    normals = cell_normals[row]
    covs = cell_cov[row]

    vp = jnp.zeros((3,), dtype=frame.points.dtype) if view_point is None else view_point
    to_vp = vp[None, :] - frame.points
    sign = jnp.where(jnp.sum(normals * to_vp, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    normals = jnp.where(found[:, None], normals * sign, 0.0)
    eye = jnp.eye(3, dtype=covs.dtype)
    covs = jnp.where(found[:, None, None], covs, eye[None])
    return frame.replace(normals=normals, covs=covs)
