"""Downsampling / outlier removal (reference: voxelgrid_sampling,
random_sampling, randomgrid_sampling, remove_outliers in
src/gtsam_points/types/point_cloud_cpu_funcs.cpp:27-685).

TPU design: one sort by packed voxel key + masked segment reductions, fixed
output capacity. No std::unordered_map, no dynamic shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.types.frame import Frame


def voxelgrid_sampling(frame: Frame, leaf: float, capacity: Optional[int] = None) -> Frame:
    """Average points (and attributes) per voxel. Output capacity defaults to
    the input capacity; cells beyond capacity are dropped (rare — only if more
    distinct occupied voxels than points)."""
    n = frame.capacity
    cap = capacity if capacity is not None else n
    keys = vk.point_keys(frame.points, frame.mask, leaf)
    order = jnp.argsort(keys)
    skeys = keys[order]
    valid = skeys != vk.INVALID_KEY
    is_new = valid & jnp.concatenate([jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    slot = jnp.where(valid, jnp.minimum(seg, cap), cap)  # extra row = dropped

    def seg_mean(arr):
        if arr is None:
            return None
        sarr = arr[order]
        summed = jnp.zeros((cap + 1,) + arr.shape[1:], dtype=jnp.float32).at[slot].add(
            jnp.where(valid.reshape((-1,) + (1,) * (arr.ndim - 1)), sarr, 0.0)
        )
        return summed[:cap]

    counts = jnp.zeros((cap + 1,), dtype=jnp.int32).at[slot].add(valid.astype(jnp.int32))[:cap]
    denom = jnp.maximum(counts, 1).astype(jnp.float32)

    def div(arr):
        if arr is None:
            return None
        return arr / denom.reshape((-1,) + (1,) * (arr.ndim - 1))

    points = div(seg_mean(frame.points))
    normals = div(seg_mean(frame.normals))
    if normals is not None:
        norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals / jnp.maximum(norm, 1e-12)
    out_mask = counts > 0
    points = jnp.where(out_mask[:, None], points, points[:1])
    return Frame(
        points=points,
        mask=out_mask,
        normals=normals,
        covs=div(seg_mean(frame.covs)),
        intensities=div(seg_mean(frame.intensities)),
        times=div(seg_mean(frame.times)),
    )


def random_sampling(frame: Frame, num_samples: int, key: jax.Array) -> Frame:
    """Uniform sampling without replacement among valid points (reference:
    random_sampling, point_cloud_cpu_funcs.cpp:78)."""
    n = frame.capacity
    scores = jax.random.uniform(key, (n,))
    scores = jnp.where(frame.mask, scores, 2.0)  # invalid last
    order = jnp.argsort(scores)[:num_samples]
    picked_valid = frame.mask[order]

    def take(arr):
        return None if arr is None else arr[order]

    return Frame(
        points=take(frame.points),
        mask=picked_valid,
        normals=take(frame.normals),
        covs=take(frame.covs),
        intensities=take(frame.intensities),
        times=take(frame.times),
    )


def randomgrid_sampling(
    frame: Frame, leaf: float, sampling_rate: float, key: jax.Array, capacity: Optional[int] = None
) -> Frame:
    """Voxel-stratified random sampling (reference: randomgrid_sampling,
    point_cloud_cpu_funcs.cpp:298): keep ~sampling_rate of points, at most a
    budgeted number per voxel, so dense regions are thinned first.

    TPU design: sort by (voxel key, random tiebreak), keep each point whose
    rank within its voxel is below the per-voxel budget."""
    n = frame.capacity
    target = jnp.int32(jnp.round(sampling_rate * frame.num_valid()))
    keys = vk.point_keys(frame.points, frame.mask, leaf)
    # random tiebreak inside each voxel: sort by key with random permutation first
    perm = jax.random.permutation(key, n)
    pkeys = keys[perm]
    order = jnp.argsort(pkeys, stable=True)
    order = perm[order]
    skeys = keys[order]
    valid = skeys != vk.INVALID_KEY
    is_new = valid & jnp.concatenate([jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    # rank of point within its voxel
    arange = jnp.arange(n, dtype=jnp.int32)
    seg_start = jnp.zeros((n + 1,), dtype=jnp.int32).at[jnp.where(is_new, seg, n)].set(arange)
    rank = arange - seg_start[jnp.maximum(seg, 0)]
    num_cells = jnp.maximum(seg[-1] + 1, 1)
    budget = jnp.maximum(target // num_cells, 1)
    keep = valid & (rank < budget)
    # compact kept points to the front
    cap = capacity if capacity is not None else n
    dest = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, cap)

    def compact(arr):
        if arr is None:
            return None
        sarr = arr[order]
        out = jnp.zeros((cap + 1,) + arr.shape[1:], dtype=arr.dtype).at[dest].set(sarr)
        return out[:cap]

    kept = jnp.zeros((cap + 1,), dtype=bool).at[dest].set(keep)[:cap]
    return Frame(
        points=compact(frame.points),
        mask=kept,
        normals=compact(frame.normals),
        covs=compact(frame.covs),
        intensities=compact(frame.intensities),
        times=compact(frame.times),
    )


def remove_outliers(
    frame: Frame,
    k: int = 10,
    std_thresh: float = 1.0,
    num_neighbor_cells: int = 27,
    grid_leaf: Optional[float] = None,
) -> Frame:
    """Statistical outlier removal (reference: find_inlier_points/remove_outliers,
    point_cloud_cpu_funcs.cpp:576+): a point is an outlier if its mean k-NN
    distance exceeds mean + std_thresh * stddev over the cloud. Marks outliers
    invalid in the mask (no compaction)."""
    from gtsam_points_tpu.ops.hash_grid import build_hash_grid, knn_search

    if grid_leaf is None:
        # heuristic: median nearest-neighbor spacing scale from bbox volume
        pts = jnp.where(frame.mask[:, None], frame.points, 0.0)
        nvalid = jnp.maximum(frame.num_valid(), 1)
        lo = jnp.min(jnp.where(frame.mask[:, None], frame.points, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(frame.mask[:, None], frame.points, -jnp.inf), axis=0)
        vol = jnp.prod(jnp.maximum(hi - lo, 1e-3))
        grid_leaf = float(jnp.cbrt(vol / nvalid) * 4.0)
    grid = build_hash_grid(frame.points, frame.mask, grid_leaf)
    _, sq, valid = knn_search(grid, frame.points, frame.mask, k + 1, num_neighbor_cells)
    d = jnp.sqrt(jnp.where(valid, sq, 0.0))
    n_nb = jnp.sum(valid[:, 1:], axis=1)
    mean_d = jnp.sum(d[:, 1:], axis=1) / jnp.maximum(n_nb, 1)
    # A point with NO neighbors inside the grid's search reach is infinitely
    # isolated — the reference's KdTree would report a huge kNN distance for
    # it (small_kdtree is exact at any range); mark it an outlier directly and
    # keep it out of the mean/std statistics.
    isolated = frame.mask & (n_nb == 0)
    ok = frame.mask & ~isolated
    mu = jnp.sum(jnp.where(ok, mean_d, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
    var = jnp.sum(jnp.where(ok, (mean_d - mu) ** 2, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
    thresh = mu + std_thresh * jnp.sqrt(var)
    return frame.replace(mask=ok & (mean_d <= thresh))
