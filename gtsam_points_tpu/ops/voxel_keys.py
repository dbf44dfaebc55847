"""Voxel coordinate keys for grid hashing / sorting (int32, TPU-friendly).

The reference hashes Eigen::Vector3i with an XOR/murmur mix into an
open-addressing table (reference: include/gtsam_points/util/vector3i_hash.hpp,
include/gtsam_points/cuda/kernels/vector3_hash.cuh:14-60). On TPU we avoid
data-dependent probing in the common path by *sorting* packed voxel keys and
resolving lookups with vectorized binary search; the key itself is a reversible
bit-packing of the (offset) integer coordinates, so equal keys <=> equal voxels
(no hash collisions within the supported coordinate range).

Packing: each coordinate is offset by 2^(BITS-1) and packed into
BITS_X+BITS_Y+BITS_Z = 30 bits of a non-negative int32. Coordinates outside
[-2^(BITS-1), 2^(BITS-1)) wrap (very distant voxels may alias — the analogue of
the reference's bounded-probe insertion failures, which it explicitly tolerates
via `target_points_drop_rate`, reference: include/gtsam_points/types/gaussian_voxelmap_gpu.hpp:49-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BITS = 10  # per axis -> 2^10 voxels per axis, 30-bit keys
RANGE = 1 << BITS
HALF = RANGE // 2
MASK = RANGE - 1

# Sentinel key larger than any packed key (packed keys < 2^30).
INVALID_KEY = np.int32(0x7FFFFFFF)  # numpy scalar: folds as a literal at
# lowering instead of a device-array constant (a device fetch per jit lower)


def fast_floor(x: jax.Array) -> jax.Array:
    """Vectorized floor to int32 (reference: include/gtsam_points/util/fast_floor.hpp)."""
    i = x.astype(jnp.int32)
    return i - (x < i.astype(x.dtype)).astype(jnp.int32)


def voxel_coords(points: jax.Array, inv_leaf: jax.Array) -> jax.Array:
    """[..., 3] float points -> [..., 3] int32 voxel coords."""
    return fast_floor(points * inv_leaf)


def pack_coords(coords: jax.Array) -> jax.Array:
    """[..., 3] int32 coords -> [...] int32 key (wrapping into BITS bits/axis)."""
    c = (coords + HALF) & MASK
    return (c[..., 0] << (2 * BITS)) | (c[..., 1] << BITS) | c[..., 2]


def unpack_key(key: jax.Array) -> jax.Array:
    """Inverse of pack_coords (valid keys only)."""
    x = ((key >> (2 * BITS)) & MASK) - HALF
    y = ((key >> BITS) & MASK) - HALF
    z = (key & MASK) - HALF
    return jnp.stack([x, y, z], axis=-1)


def point_keys(points: jax.Array, mask: jax.Array, leaf) -> jax.Array:
    """Packed voxel keys with padding slots forced to INVALID_KEY.
    `leaf` may be a python float or a traced scalar."""
    keys = pack_coords(voxel_coords(points, 1.0 / leaf))
    return jnp.where(mask, keys, INVALID_KEY)


def neighbor_offsets(num: int) -> jax.Array:
    """Voxel neighborhood offset patterns (reference: ann/impl/incremental_voxelmap_impl.hpp:71-92
    supports 1/7/19/27-neighborhoods)."""
    if num == 1:
        offs = [(0, 0, 0)]
    elif num == 7:
        offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    elif num == 19:
        offs = [
            (x, y, z)
            for x in (-1, 0, 1)
            for y in (-1, 0, 1)
            for z in (-1, 0, 1)
            if abs(x) + abs(y) + abs(z) <= 2
        ]
    elif num == 27:
        offs = [(x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)]
    else:
        raise ValueError(f"unsupported neighborhood {num} (use 1/7/19/27)")
    return jnp.asarray(offs, dtype=jnp.int32)


def point_keys_planar(points_p: jax.Array, mask: jax.Array, leaf) -> jax.Array:
    """Planar variant of point_keys: points_p [3, N] -> keys [N]. Sublane
    slices instead of minor-dim slices — full lane occupancy on TPU."""
    c = fast_floor(points_p * (1.0 / leaf))
    c = (c + HALF) & MASK
    keys = (c[0] << (2 * BITS)) | (c[1] << BITS) | c[2]
    return jnp.where(mask, keys, INVALID_KEY)
