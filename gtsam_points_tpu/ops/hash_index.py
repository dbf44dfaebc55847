"""Shared double-hash index over packed voxel keys (used by the Gaussian voxel
map, the kNN hash grid, and the occupancy grid). Same murmur mixing family as
the reference's vector3i hash (cuda/kernels/vector3_hash.cuh:14-60).

Layout: each table slot stores the PAIR (row, key) in the last axis —
index[t, slot] = [row, key] — so one wide row-gather both locates the record
and verifies the key. Measured on TPU this is ~2.7x faster than the classic
row-only table (which needs a second dependent gather into the key array to
verify): TPU gathers cost per-ELEMENT-GROUP, so fetching 2 lanes per probe is
nearly free while halving the dependent-gather chain.

The table is sized ~4x the key capacity (power of two, derived statically from
the index array's shape at probe time) — TPU gathers cost roughly linearly in
table footprint once it spills the local cache, so a right-sized table is
~2x faster to probe than a fixed 2^20 one at typical scan sizes."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.ops import voxel_keys as vk

# Upper bound kept for backward compatibility with serialized maps.
HASH_BITS = 20
HASH_SIZE = 1 << HASH_BITS
MIN_HASH_SIZE = 1 << 12

_MIX = (
    (np.uint32(0x85EBCA6B), np.uint32(0xC2B2AE35)),
    (np.uint32(0xCC9E2D51), np.uint32(0x1B873593)),
)


def table_size_for(capacity: int) -> int:
    """Power-of-two table size ~4x the number of keys."""
    size = MIN_HASH_SIZE
    while size < 4 * capacity and size < HASH_SIZE:
        size *= 2
    return size


def hash_key(key: jax.Array, which: int = 0, size: int = HASH_SIZE) -> jax.Array:
    m1, m2 = _MIX[which]
    h = key.astype(jnp.uint32)
    h = (h ^ (h >> 16)) * m1
    h = (h ^ (h >> 13)) * m2
    h = h ^ (h >> 16)
    return (h & np.uint32(size - 1)).astype(jnp.int32)


def empty_hash_index(size: int) -> jax.Array:
    """[2, size, 2] pair table: row = -1, key = INVALID_KEY."""
    empty = jnp.broadcast_to(
        jnp.asarray([-1, vk.INVALID_KEY], dtype=jnp.int32), (2, size, 2)
    )
    return jnp.array(empty)


def build_hash_index(keys: jax.Array, size: int | None = None) -> jax.Array:
    """[C] keys (INVALID_KEY padded) -> [2, size, 2] double-hash pair index
    (row = -1 / key = INVALID_KEY when empty). Probe-1 collision losers land in
    table 2; double collisions (rare at 4x load headroom) are dropped,
    mirroring the reference's tolerated insertion drops
    (types/gaussian_voxelmap_gpu.hpp:49-54)."""
    if size is None:
        size = table_size_for(keys.shape[0])
    valid = keys != vk.INVALID_KEY
    rows = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sentinel = np.int32(0x7FFFFFFF)

    slots1 = jnp.where(valid, hash_key(keys, 0, size), size)
    t1 = jnp.full((size + 1,), sentinel).at[slots1].min(rows)[:size]
    won1 = valid & (t1[jnp.minimum(slots1, size - 1)] == rows)
    k1 = (
        jnp.full((size + 1,), vk.INVALID_KEY)
        .at[jnp.where(won1, slots1, size)]
        .set(keys)[:size]
    )

    slots2 = jnp.where(valid & ~won1, hash_key(keys, 1, size), size)
    t2 = jnp.full((size + 1,), sentinel).at[slots2].min(rows)[:size]
    won2 = valid & ~won1 & (t2[jnp.minimum(slots2, size - 1)] == rows)
    k2 = (
        jnp.full((size + 1,), vk.INVALID_KEY)
        .at[jnp.where(won2, slots2, size)]
        .set(keys)[:size]
    )

    t1 = jnp.where(t1 == sentinel, -1, t1)
    t2 = jnp.where(t2 == sentinel, -1, t2)
    return jnp.stack(
        [jnp.stack([t1, k1], axis=-1), jnp.stack([t2, k2], axis=-1)]
    )


def probe(index: jax.Array, keys_table: jax.Array, query_keys: jax.Array):
    """-> (row [..], found [..]). Two independent pair-gathers; key
    verification comes with the gathered pair, so there is no second
    dependent gather (keys_table is unused and kept for API symmetry
    with build_hash_index's input)."""
    del keys_table
    size = index.shape[-2]
    e1 = index[0][hash_key(query_keys, 0, size)]  # [..., 2]
    e2 = index[1][hash_key(query_keys, 1, size)]
    ok1 = e1[..., 1] == query_keys
    ok2 = e2[..., 1] == query_keys
    row = jnp.where(ok1, e1[..., 0], e2[..., 0])
    found = (ok1 | ok2) & (query_keys != vk.INVALID_KEY)
    return jnp.maximum(row, 0), found
