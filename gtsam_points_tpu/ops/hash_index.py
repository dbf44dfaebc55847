"""Shared double-hash index over packed voxel keys (used by the Gaussian voxel
map and the kNN hash grid). One dependent gather per probe instead of a log-C
binary search; same murmur mixing family as the reference's vector3i hash
(cuda/kernels/vector3_hash.cuh:14-60)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops import voxel_keys as vk

HASH_BITS = 20
HASH_SIZE = 1 << HASH_BITS

_MIX = (
    (jnp.uint32(0x85EBCA6B), jnp.uint32(0xC2B2AE35)),
    (jnp.uint32(0xCC9E2D51), jnp.uint32(0x1B873593)),
)


def hash_key(key: jax.Array, which: int = 0) -> jax.Array:
    m1, m2 = _MIX[which]
    h = key.astype(jnp.uint32)
    h = (h ^ (h >> 16)) * m1
    h = (h ^ (h >> 13)) * m2
    h = h ^ (h >> 16)
    return (h & jnp.uint32(HASH_SIZE - 1)).astype(jnp.int32)


def build_hash_index(keys: jax.Array) -> jax.Array:
    """[C] keys (INVALID_KEY padded) -> [2, HASH_SIZE] double-hash index
    (-1 empty). Probe-1 collision losers land in table 2; double collisions
    (~1e-5 at 100k keys) are dropped."""
    valid = keys != vk.INVALID_KEY
    rows = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sentinel = jnp.int32(0x7FFFFFFF)

    slots1 = jnp.where(valid, hash_key(keys, 0), HASH_SIZE)
    t1 = jnp.full((HASH_SIZE + 1,), sentinel).at[slots1].min(rows)[:HASH_SIZE]
    won1 = valid & (t1[jnp.minimum(slots1, HASH_SIZE - 1)] == rows)

    slots2 = jnp.where(valid & ~won1, hash_key(keys, 1), HASH_SIZE)
    t2 = jnp.full((HASH_SIZE + 1,), sentinel).at[slots2].min(rows)[:HASH_SIZE]

    t1 = jnp.where(t1 == sentinel, -1, t1)
    t2 = jnp.where(t2 == sentinel, -1, t2)
    return jnp.stack([t1, t2])


def probe(index: jax.Array, keys_table: jax.Array, query_keys: jax.Array):
    """-> (row [..], found [..]): row into keys_table where it equals the query."""
    row1 = index[0, hash_key(query_keys, 0)]
    ok1 = (row1 >= 0) & (keys_table[jnp.maximum(row1, 0)] == query_keys)
    row2 = index[1, hash_key(query_keys, 1)]
    ok2 = (row2 >= 0) & (keys_table[jnp.maximum(row2, 0)] == query_keys)
    row = jnp.where(ok1, row1, row2)
    found = (ok1 | ok2) & (query_keys != vk.INVALID_KEY)
    return jnp.maximum(row, 0), found
