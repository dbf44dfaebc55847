"""Incremental covariance map: a point map whose normals/covariances are
(re-)estimated online with eigenvalue-based validity gating.

Reference: IncrementalCovarianceVoxelMap / IncrementalCovarianceContainer
(include/gtsam_points/ann/incremental_covariance_voxelmap.hpp:13-82,
src/gtsam_points/ann/incremental_covariance_voxelmap.cpp): points inserted into
an iVox re-estimate their covariances from current neighbors; eigenvalue
running statistics gate which points are "valid" for kNN consumers; stale
invalid points age out.

TPU design: a fixed-capacity point buffer (ring semantics by age) + one grid
kNN pass per insertion batch re-estimates covariances of ALL resident points
(cheap: one fused launch); validity = eigenvalue-ratio bands around running
statistics (utils/stats.RunningStatistics pytree). `knn_search` exposes
valid-only and force variants like the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.eigh3 import eigh3
from gtsam_points_tpu.ops.hash_grid import build_hash_grid, knn_search
from gtsam_points_tpu.ops.features import neighbor_covariances
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils.stats import RunningStatistics


class IncrementalCovarianceMap(NamedTuple):
    points: jax.Array  # [C, 3]
    mask: jax.Array  # [C]
    normals: jax.Array  # [C, 3]
    covs: jax.Array  # [C, 3, 3]
    valid: jax.Array  # [C] passes eigenvalue gating
    birth: jax.Array  # [C] insertion epoch
    epoch: jax.Array  # ()
    eig_stats: RunningStatistics  # over log eigenvalue ratios [2]
    cursor: jax.Array  # () next write position (ring)

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def as_frame(self) -> Frame:
        return Frame(points=self.points, mask=self.mask & self.valid, normals=self.normals, covs=self.covs)


def empty_incremental_covariance_map(capacity: int) -> IncrementalCovarianceMap:
    return IncrementalCovarianceMap(
        points=jnp.zeros((capacity, 3), jnp.float32),
        mask=jnp.zeros((capacity,), bool),
        normals=jnp.zeros((capacity, 3), jnp.float32),
        covs=jnp.zeros((capacity, 3, 3), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        birth=jnp.zeros((capacity,), jnp.int32),
        epoch=jnp.int32(0),
        eig_stats=RunningStatistics.empty((2,)),
        cursor=jnp.int32(0),
    )


def insert(
    cmap: IncrementalCovarianceMap,
    frame: Frame,
    k: int = 10,
    grid_leaf: float = 1.0,
    ratio_sigma: float = 3.0,
    warmup: int = 256,
) -> IncrementalCovarianceMap:
    """Insert a scan (ring overwrite of the oldest slots) and re-estimate
    covariances/validity for the whole buffer in one fused pass."""
    cap = cmap.capacity
    n = frame.capacity
    epoch = cmap.epoch + 1

    # ring insertion: positions cursor..cursor+n-1 (mod cap)
    pos = (cmap.cursor + jnp.arange(n, dtype=jnp.int32)) % cap
    write = frame.mask
    points = cmap.points.at[pos].set(jnp.where(write[:, None], frame.points, cmap.points[pos]))
    mask = cmap.mask.at[pos].set(write | cmap.mask[pos])
    birth = cmap.birth.at[pos].set(jnp.where(write, epoch, cmap.birth[pos]))
    cursor = (cmap.cursor + frame.num_valid()) % cap

    # re-estimate covariances for all resident points
    grid = build_hash_grid(points, mask, grid_leaf)
    nn_idx, _, nn_valid = knn_search(grid, points, mask, k)
    raw_cov, _ = neighbor_covariances(points, nn_idx, nn_valid)
    eigvals, eigvecs = eigh3(raw_cov)
    normals = eigvecs[..., 0]

    # validity gating on log eigenvalue ratios (planarity band), with running
    # statistics like the reference's warmup/lowrate cycles
    e0 = jnp.maximum(eigvals[:, 0], 1e-12)
    e1 = jnp.maximum(eigvals[:, 1], 1e-12)
    e2 = jnp.maximum(eigvals[:, 2], 1e-12)
    ratios = jnp.stack([jnp.log10(e1 / e0), jnp.log10(e2 / e1)], axis=-1)  # [C, 2]
    enough = jnp.sum(nn_valid, axis=-1) >= 5
    stats = cmap.eig_stats
    in_warmup = stats.count < warmup
    mean, std = stats.mean(), jnp.maximum(stats.std(), 1e-3)
    within = jnp.all(jnp.abs(ratios - mean) <= ratio_sigma * std, axis=-1)
    valid = mask & enough & jnp.where(in_warmup, True, within)

    # update running statistics with the batch mean of valid ratios
    batch_w = (mask & enough).astype(jnp.float32)
    batch_n = jnp.maximum(jnp.sum(batch_w), 1.0)
    batch_mean = jnp.sum(ratios * batch_w[:, None], axis=0) / batch_n
    stats = stats.add(batch_mean)

    return IncrementalCovarianceMap(
        points=points,
        mask=mask,
        normals=normals,
        covs=raw_cov,
        valid=valid,
        birth=birth,
        epoch=epoch,
        eig_stats=stats,
        cursor=cursor,
    )


def knn_search_valid(cmap: IncrementalCovarianceMap, queries, query_mask, k: int, **kwargs):
    """kNN over VALID points only (reference: knn_search vs knn_search_force)."""
    grid = build_hash_grid(cmap.points, cmap.mask & cmap.valid, kwargs.pop("grid_leaf", 1.0))
    return knn_search(grid, queries, query_mask, k, **kwargs)


def knn_search_force(cmap: IncrementalCovarianceMap, queries, query_mask, k: int, **kwargs):
    """kNN over ALL resident points regardless of validity."""
    grid = build_hash_grid(cmap.points, cmap.mask, kwargs.pop("grid_leaf", 1.0))
    return knn_search(grid, queries, query_mask, k, **kwargs)
