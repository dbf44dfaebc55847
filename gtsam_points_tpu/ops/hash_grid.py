"""Sorted voxel-key grid: the TPU-native spatial index.

Replaces the reference's pointer-chasing structures — nanoflann/small_kdtree
(reference: include/gtsam_points/ann/small_kdtree.hpp) and the
IncrementalVoxelMap's unordered_map (reference:
include/gtsam_points/ann/incremental_voxelmap.hpp:35-150) — with one batched,
fixed-shape primitive:

  1. pack each point's voxel coordinate into an int32 key,
  2. sort points by key (one XLA sort),
  3. per-cell [start, count] ranges via segment boundaries,
  4. O(log C) vectorized binary-search lookup for queries.

Everything is static-shape: the table has a fixed cell capacity and each cell
contributes at most `max_points_per_cell` kNN candidates (the analogue of
FlatContainer's max_num_points_in_cell admission, reference:
include/gtsam_points/ann/flat_container.hpp:15-100).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops import voxel_keys as vk


class HashGrid(NamedTuple):
    """Static-shape voxel grid over a fixed point buffer.

    leaf:        () float32 voxel edge length
    points:      [N, 3] points sorted by voxel key
    point_index: [N] int32 original index of each sorted point (-1 = padding)
    point_key:   [N] int32 packed voxel key of each sorted point
    cell_keys:   [C] int32 sorted unique voxel keys (INVALID_KEY padded)
    cell_start:  [C] int32 index of first point of the cell in `points`
    cell_count:  [C] int32 number of points in the cell
    num_cells:   () int32
    """

    leaf: jax.Array
    points: jax.Array
    point_index: jax.Array
    point_key: jax.Array
    cell_keys: jax.Array
    cell_start: jax.Array
    cell_count: jax.Array
    num_cells: jax.Array

    @property
    def cell_capacity(self) -> int:
        return self.cell_keys.shape[0]


def build_hash_grid(points: jax.Array, mask: jax.Array, leaf: float, cell_capacity: int | None = None) -> HashGrid:
    """Build the grid. `cell_capacity` bounds the number of distinct voxels
    (default: number of points, always enough)."""
    n = points.shape[0]
    cap = cell_capacity if cell_capacity is not None else n
    keys = vk.point_keys(points, mask, leaf)

    order = jnp.argsort(keys)
    skeys = keys[order]
    spoints = points[order]
    sindex = jnp.where(skeys == vk.INVALID_KEY, -1, order.astype(jnp.int32))

    valid = skeys != vk.INVALID_KEY
    is_new = valid & jnp.concatenate([jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]])
    seg_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # [N], -1 before first valid
    num_cells = jnp.maximum(seg_id[-1] + 1, 0)

    slot = jnp.where(is_new, seg_id, cap)  # out-of-range drops
    cell_keys = jnp.full((cap + 1,), vk.INVALID_KEY, dtype=jnp.int32).at[slot].set(skeys)[:cap]
    arange = jnp.arange(n, dtype=jnp.int32)
    cell_start = jnp.zeros((cap + 1,), dtype=jnp.int32).at[slot].set(arange)[:cap]
    ones = valid.astype(jnp.int32)
    cell_count = (
        jnp.zeros((cap + 1,), dtype=jnp.int32)
        .at[jnp.where(valid, seg_id, cap)]
        .add(ones)[:cap]
    )

    return HashGrid(
        leaf=jnp.float32(leaf),
        points=spoints,
        point_index=sindex,
        point_key=skeys,
        cell_keys=cell_keys,
        cell_start=cell_start,
        cell_count=cell_count,
        num_cells=num_cells,
    )


def lookup_cells(grid: HashGrid, query_keys: jax.Array):
    """Vectorized exact lookup: keys -> (cell_idx, found)."""
    idx = jnp.searchsorted(grid.cell_keys, query_keys, side="left").astype(jnp.int32)
    idx_c = jnp.minimum(idx, grid.cell_capacity - 1)
    found = (grid.cell_keys[idx_c] == query_keys) & (query_keys != vk.INVALID_KEY)
    return idx_c, found


def knn_search(
    grid: HashGrid,
    queries: jax.Array,
    query_mask: jax.Array,
    k: int,
    num_neighbor_cells: int = 27,
    max_points_per_cell: int = 16,
    max_sq_dist: float = jnp.inf,
):
    """Grid kNN: scan neighbor voxels of each query, take top-k by distance.

    Mirrors IncrementalVoxelMap::knn_search's 1/7/19/27-cell scan (reference:
    include/gtsam_points/ann/impl/incremental_voxelmap_impl.hpp:71-92) but over
    all queries at once.

    Returns (indices [Q, k] into the ORIGINAL point array, sq_dists [Q, k],
    valid [Q, k]). Invalid slots have index -1 and sq_dist inf.
    """
    offsets = vk.neighbor_offsets(num_neighbor_cells)  # [O, 3]
    inv_leaf = 1.0 / grid.leaf
    coords = vk.voxel_coords(queries, inv_leaf)  # [Q, 3]
    nb_keys = vk.pack_coords(coords[:, None, :] + offsets[None, :, :])  # [Q, O]
    nb_keys = jnp.where(query_mask[:, None], nb_keys, vk.INVALID_KEY)

    cell_idx, found = lookup_cells(grid, nb_keys)  # [Q, O]
    start = grid.cell_start[cell_idx]  # [Q, O]
    count = jnp.where(found, grid.cell_count[cell_idx], 0)  # [Q, O]

    j = jnp.arange(max_points_per_cell, dtype=jnp.int32)  # [J]
    cand_pos = start[:, :, None] + j[None, None, :]  # [Q, O, J]
    cand_valid = j[None, None, :] < count[:, :, None]
    cand_pos = jnp.where(cand_valid, cand_pos, 0)

    q, o, jj = cand_pos.shape
    flat_pos = cand_pos.reshape(q, o * jj)
    cand_pts = grid.points[flat_pos]  # [Q, O*J, 3]
    diff = cand_pts - queries[:, None, :]
    sq = jnp.sum(diff * diff, axis=-1)
    sq = jnp.where(cand_valid.reshape(q, o * jj), sq, jnp.inf)
    sq = jnp.where(sq <= max_sq_dist, sq, jnp.inf)

    neg_top, top_pos = jax.lax.top_k(-sq, k)  # [Q, k]
    top_sq = -neg_top
    top_valid = jnp.isfinite(top_sq) & query_mask[:, None]
    orig_idx = grid.point_index[jnp.take_along_axis(flat_pos, top_pos, axis=1)]
    orig_idx = jnp.where(top_valid, orig_idx, -1)
    top_sq = jnp.where(top_valid, top_sq, jnp.inf)
    return orig_idx, top_sq, top_valid


def brute_force_knn(
    points: jax.Array,
    point_mask: jax.Array,
    queries: jax.Array,
    query_mask: jax.Array,
    k: int,
    max_sq_dist: float = jnp.inf,
    block: int = 2048,
):
    """Exact O(N*Q) kNN oracle (reference tests use an O(N^2) scan as oracle,
    src/test/test_kdtree.cpp:92-244). Blocked over queries to bound memory;
    the distance matrix rides the MXU via |a|^2 + |b|^2 - 2 a.b."""
    n = points.shape[0]
    q = queries.shape[0]
    pts = jnp.where(point_mask[:, None], points, jnp.inf)
    p_sq = jnp.sum(jnp.where(point_mask[:, None], points, 0.0) ** 2, axis=-1)

    pad_q = (-q) % block
    queries_p = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qmask_p = jnp.pad(query_mask, (0, pad_q))
    nb = (q + pad_q) // block

    def body(carry, inp):
        qb, mb = inp
        d = (
            jnp.sum(qb * qb, axis=-1, keepdims=True)
            + p_sq[None, :]
            - 2.0 * qb @ jnp.where(point_mask[:, None], points, 0.0).T
        )
        d = jnp.where(point_mask[None, :], d, jnp.inf)
        d = jnp.maximum(d, 0.0)
        d = jnp.where(d <= max_sq_dist, d, jnp.inf)
        neg, idx = jax.lax.top_k(-d, k)
        sq = -neg
        valid = jnp.isfinite(sq) & mb[:, None]
        return carry, (jnp.where(valid, idx, -1), jnp.where(valid, sq, jnp.inf), valid)

    _, (idx, sq, valid) = jax.lax.scan(
        body, None, (queries_p.reshape(nb, block, 3), qmask_p.reshape(nb, block))
    )
    return idx.reshape(-1, k)[:q], sq.reshape(-1, k)[:q], valid.reshape(-1, k)[:q]
