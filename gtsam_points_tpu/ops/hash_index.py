"""Shared double-hash index over packed voxel keys (used by the Gaussian voxel
map and the kNN hash grid). One dependent gather per probe instead of a log-C
binary search; same murmur mixing family as the reference's vector3i hash
(cuda/kernels/vector3_hash.cuh:14-60).

The table is sized ~4x the key capacity (power of two, derived statically from
the index array's shape at probe time) — TPU gathers cost roughly linearly in
table footprint once it spills the local cache, so a right-sized table is
~2x faster to probe than a fixed 2^20 one at typical scan sizes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops import voxel_keys as vk

# Upper bound kept for backward compatibility with serialized maps.
HASH_BITS = 20
HASH_SIZE = 1 << HASH_BITS
MIN_HASH_SIZE = 1 << 12

_MIX = (
    (jnp.uint32(0x85EBCA6B), jnp.uint32(0xC2B2AE35)),
    (jnp.uint32(0xCC9E2D51), jnp.uint32(0x1B873593)),
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
    return (h & jnp.uint32(size - 1)).astype(jnp.int32)


def build_hash_index(keys: jax.Array, size: int | None = None) -> jax.Array:
    """[C] keys (INVALID_KEY padded) -> [2, size] double-hash index
    (-1 empty). Probe-1 collision losers land in table 2; double collisions
    (rare at 4x load headroom) are dropped."""
    if size is None:
        size = table_size_for(keys.shape[0])
    valid = keys != vk.INVALID_KEY
    rows = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sentinel = jnp.int32(0x7FFFFFFF)

    slots1 = jnp.where(valid, hash_key(keys, 0, size), size)
    t1 = jnp.full((size + 1,), sentinel).at[slots1].min(rows)[:size]
    won1 = valid & (t1[jnp.minimum(slots1, size - 1)] == rows)

    slots2 = jnp.where(valid & ~won1, hash_key(keys, 1, size), size)
    t2 = jnp.full((size + 1,), sentinel).at[slots2].min(rows)[:size]

    t1 = jnp.where(t1 == sentinel, -1, t1)
    t2 = jnp.where(t2 == sentinel, -1, t2)
    return jnp.stack([t1, t2])


def probe(index: jax.Array, keys_table: jax.Array, query_keys: jax.Array):
    """-> (row [..], found [..]): row into keys_table where it equals the query.
    The table size is static from index.shape[-1]."""
    size = index.shape[-1]
    row1 = index[0][hash_key(query_keys, 0, size)]
    ok1 = (row1 >= 0) & (keys_table[jnp.maximum(row1, 0)] == query_keys)
    row2 = index[1][hash_key(query_keys, 1, size)]
    ok2 = (row2 >= 0) & (keys_table[jnp.maximum(row2, 0)] == query_keys)
    row = jnp.where(ok1, row1, row2)
    found = (ok1 | ok2) & (query_keys != vk.INVALID_KEY)
    return jnp.maximum(row, 0), found
