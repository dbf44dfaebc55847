"""Bit-packed occupancy grid.

Reference: FastOccupancyGrid (include/gtsam_points/ann/fast_occupancy_grid.hpp:51-120)
— 4³-cell bit blocks in a flat hash used as a fast inlier counter for RANSAC.
TPU design: each 4x4x4 block of cells is one uint64... JAX int64 requires x64;
we use TWO uint32 words per block (64 bits = 4x4x4 cells). Blocks live in a
double-hash table like the voxel map; occupancy checks are two gathers + bit
tests, fully vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.ops.hash_index import build_hash_index as _build_hash_index, probe as _probe


class OccupancyGrid(NamedTuple):
    leaf: jax.Array  # cell size
    block_keys: jax.Array  # [B] packed BLOCK coords (sorted, INVALID padded)
    bits: jax.Array  # [B, 2] uint32 bit words (64 cells per block)
    hash_index: jax.Array  # [2, size, 2] (row, key) pair index

    @property
    def capacity(self) -> int:
        return self.block_keys.shape[0]


def _split_coords(coords):
    """Cell coords -> (block coords, bit index in [0, 64))."""
    block = coords >> 2  # /4
    local = coords & 3
    bit = (local[..., 0] << 4) | (local[..., 1] << 2) | local[..., 2]
    return block, bit


def build_occupancy_grid(points, mask, leaf: float, block_capacity: int | None = None) -> OccupancyGrid:
    n = points.shape[0]
    cap = block_capacity or n
    coords = vk.voxel_coords(points, 1.0 / leaf)
    block, bit = _split_coords(coords)
    keys = jnp.where(mask, vk.pack_coords(block), vk.INVALID_KEY)

    order = jnp.argsort(keys)
    skeys = keys[order]
    sbit = bit[order]
    valid = skeys != vk.INVALID_KEY
    is_new = valid & jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    slot = jnp.where(valid, jnp.minimum(seg, cap), cap)

    # OR bits per block: dedupe (slot, bit) pairs (scatter-add of single-bit
    # words is an OR only when each pair contributes once)
    pair = slot * 64 + jnp.where(valid, sbit, 0)
    pair_sorted = jnp.sort(pair)
    first = jnp.concatenate([jnp.ones((1,), bool), pair_sorted[1:] != pair_sorted[:-1]])
    uniq = jnp.where(first, pair_sorted, cap * 64 + 63)
    u_slot = (uniq // 64).astype(jnp.int32)
    u_bit = (uniq % 64).astype(jnp.int32)
    u_word = (u_bit >> 5).astype(jnp.int32)
    u_val = jnp.uint32(1) << (u_bit & 31).astype(jnp.uint32)
    bits = jnp.zeros((cap + 1, 2), jnp.uint32).at[u_slot, u_word].add(u_val)[:cap]

    block_keys = jnp.full((cap + 1,), vk.INVALID_KEY, jnp.int32).at[
        jnp.where(is_new, jnp.minimum(seg, cap), cap)
    ].set(skeys)[:cap]
    return OccupancyGrid(
        leaf=jnp.float32(leaf),
        block_keys=block_keys,
        bits=bits,
        hash_index=_build_hash_index(block_keys),
    )


def occupied(grid: OccupancyGrid, points, mask):
    """[N] bool: does each point's cell contain any target point."""
    coords = vk.voxel_coords(points, 1.0 / grid.leaf)
    block, bit = _split_coords(coords)
    keys = jnp.where(mask, vk.pack_coords(block), vk.INVALID_KEY)
    row, found_block = _probe(grid.hash_index, grid.block_keys, keys)
    word = (bit >> 5).astype(jnp.int32)
    shift = (bit & 31).astype(jnp.uint32)
    w = grid.bits[row, word]
    return found_block & ((w >> shift) & jnp.uint32(1)).astype(bool) & mask


def calc_overlap(grid: OccupancyGrid, points, mask, T=None) -> jax.Array:
    """Fraction of (transformed) points landing in occupied cells (reference:
    FastOccupancyGrid::calc_overlap)."""
    from gtsam_points_tpu.utils import se3

    pts = points if T is None else se3.transform_points(T, points)
    occ = occupied(grid, pts, mask)
    return jnp.sum(occ.astype(jnp.float32)) / jnp.maximum(jnp.sum(mask), 1)
