"""Gaussian voxel maps: per-voxel (count, mean, covariance) statistics with
O(1)-style batched lookup, plus incremental insertion with LRU eviction.

TPU-native redesign of:
- GaussianVoxelMapCPU / GaussianVoxel running stats + finalize (reference:
  include/gtsam_points/types/gaussian_voxelmap_cpu.hpp:13-128),
- the GPU open-addressing voxel hash map built with atomicCAS bucket claiming
  (reference: src/gtsam_points/types/gaussian_voxelmap_gpu.cu:211-307),
- IncrementalVoxelMap's LRU eviction (reference:
  include/gtsam_points/ann/impl/incremental_voxelmap_impl.hpp:49-62).

Instead of a mutable hash table, the map is an immutable pytree with sorted
packed voxel keys; insertion merges (old table ∪ new scan stats) with one sort
and masked segment reductions — a pure function, so the whole odometry loop
stays inside jit. Lookup is vectorized binary search. Saved/loaded as npz
(the analogue of save_compact/load, reference:
include/gtsam_points/types/gaussian_voxelmap_cpu.hpp:98-108).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.types.frame import Frame


class GaussianVoxelMap(NamedTuple):
    """Sorted-key Gaussian voxel map (static capacity C).

    leaf:      () float32 voxel edge length
    keys:      [C] int32 sorted packed voxel keys (INVALID_KEY padded)
    count:     [C] float32 number of points accumulated per voxel
    mean:      [C, 3] float32 voxel mean (finalized)
    cov:       [C, 3, 3] float32 voxel covariance (finalized; regularized if
               built from frames with covs, matching VGICP's distribution fusion)
    last_seen: [C] int32 insertion-epoch of last touch (for LRU)
    epoch:     () int32 current insertion counter
    num_voxels:() int32
    hash_index:[2, 2^HASH_BITS] int32 double-hash index: slot -> voxel row
               (-1 empty). Voxels losing a probe-1 collision land in table 2;
               double collisions (~1e-5) are dropped, mirroring the reference's
               tolerated insertion drops (types/gaussian_voxelmap_gpu.hpp:49-54).
               Lookup = two independent gathers + key verification instead of a
               log-C binary search.
    """

    leaf: jax.Array
    keys: jax.Array
    count: jax.Array
    mean: jax.Array
    cov: jax.Array
    last_seen: jax.Array
    epoch: jax.Array
    num_voxels: jax.Array
    hash_index: jax.Array
    packed: jax.Array  # [C, 16] f32: key(bitcast), count, mean(3), cov6(6), pad
    # XLA row-gather cost is per ROW, nearly independent of row width; packing
    # the whole per-voxel record into one 64-byte row makes the hot VGICP
    # fetch ONE gather instead of four (keys+count+mean+cov).

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    def as_frame(self) -> Frame:
        """Expose voxel statistics as a Frame (the reference exposes voxelmaps
        through frame-traits the same way, ann/impl/incremental_voxelmap_impl.hpp:163-228)."""
        valid = self.keys != vk.INVALID_KEY
        pts = jnp.where(valid[:, None], self.mean, 0.0)
        return Frame(points=pts, mask=valid, covs=self.cov)


from gtsam_points_tpu.ops.hash_index import (
    HASH_BITS,
    HASH_SIZE,
    build_hash_index as _build_hash_index,
    hash_key as _hash_key,
    probe as _probe,
)



def _pack_rows(keys, count, mean, cov):
    """[C] records -> [C, 16] f32 rows: key(bitcast), count, mean, cov6, pad."""
    cov6 = jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2], cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]],
        axis=-1,
    )
    key_f = jax.lax.bitcast_convert_type(keys, jnp.float32)[:, None]
    pad = jnp.zeros((keys.shape[0], 5), jnp.float32)
    return jnp.concatenate([key_f, count[:, None], mean, cov6, pad], axis=-1)


def unpack_rows(rows):
    """[N, 16] -> (keys int32, count, mean [N,3], cov [N,3,3])."""
    keys = jax.lax.bitcast_convert_type(rows[:, 0], jnp.int32)
    count = rows[:, 1]
    mean = rows[:, 2:5]
    c = rows[:, 5:11]
    cov = jnp.stack(
        [
            jnp.stack([c[:, 0], c[:, 1], c[:, 2]], axis=-1),
            jnp.stack([c[:, 1], c[:, 3], c[:, 4]], axis=-1),
            jnp.stack([c[:, 2], c[:, 4], c[:, 5]], axis=-1),
        ],
        axis=-2,
    )
    return keys, count, mean, cov


def lookup_fetch(vmap: GaussianVoxelMap, points: jax.Array, mask: jax.Array):
    """Fused probe + record fetch for the hot VGICP path:
    -> (found [N], count [N], mean [N,3], cov [N,3,3]).
    Replaces the reference device probe + per-field loads
    (cuda/kernels/lookup_voxels.cuh:35-58) with 3 int gathers + 1 row gather."""
    keys = vk.point_keys(points, mask, vmap.leaf)
    row1 = vmap.hash_index[0, _hash_key(keys, 0)]
    row2 = vmap.hash_index[1, _hash_key(keys, 1)]
    rows1 = vmap.packed[jnp.maximum(row1, 0)]
    k1 = jax.lax.bitcast_convert_type(rows1[:, 0], jnp.int32)
    ok1 = (row1 >= 0) & (k1 == keys)
    # probe 2 only where probe 1 missed (XLA computes both; cheap relative)
    rows2 = vmap.packed[jnp.maximum(row2, 0)]
    k2 = jax.lax.bitcast_convert_type(rows2[:, 0], jnp.int32)
    ok2 = (row2 >= 0) & (k2 == keys)
    rows = jnp.where(ok1[:, None], rows1, rows2)
    found = (ok1 | ok2) & (keys != vk.INVALID_KEY) & mask
    _, count, mean, cov = unpack_rows(rows)
    return found, count, mean, cov


def empty_voxelmap(leaf: float, capacity: int) -> GaussianVoxelMap:
    return GaussianVoxelMap(
        leaf=jnp.float32(leaf),
        keys=jnp.full((capacity,), vk.INVALID_KEY, dtype=jnp.int32),
        count=jnp.zeros((capacity,), dtype=jnp.float32),
        mean=jnp.zeros((capacity, 3), dtype=jnp.float32),
        cov=jnp.zeros((capacity, 3, 3), dtype=jnp.float32),
        last_seen=jnp.zeros((capacity,), dtype=jnp.int32),
        epoch=jnp.int32(0),
        num_voxels=jnp.int32(0),
        hash_index=jnp.full((2, HASH_SIZE), -1, dtype=jnp.int32),
        packed=jnp.zeros((capacity, 16), dtype=jnp.float32),
    )


def _scan_stats(frame: Frame, leaf, capacity: int):
    """Per-voxel raw moments of one scan: keys, count, sum_p, sum_ppT (+sum_cov)."""
    keys = vk.point_keys(frame.points, frame.mask, leaf)
    order = jnp.argsort(keys)
    skeys = keys[order]
    valid = skeys != vk.INVALID_KEY
    is_new = valid & jnp.concatenate([jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    slot = jnp.where(valid, jnp.minimum(seg, capacity), capacity)

    pts = frame.points[order]
    w = valid.astype(jnp.float32)
    cnt = jnp.zeros((capacity + 1,), jnp.float32).at[slot].add(w)[:capacity]
    s1 = jnp.zeros((capacity + 1, 3), jnp.float32).at[slot].add(pts * w[:, None])[:capacity]
    pp = jnp.einsum("ni,nj->nij", pts, pts) * w[:, None, None]
    if frame.covs is not None:
        pp = pp + frame.covs[order] * w[:, None, None]
    s2 = jnp.zeros((capacity + 1, 3, 3), jnp.float32).at[slot].add(pp)[:capacity]
    out_keys = jnp.full((capacity + 1,), vk.INVALID_KEY, jnp.int32).at[
        jnp.where(is_new, jnp.minimum(seg, capacity), capacity)
    ].set(skeys)[:capacity]
    return out_keys, cnt, s1, s2


def build_voxelmap(frame: Frame, leaf: float, capacity: Optional[int] = None) -> GaussianVoxelMap:
    """One-shot map from a single frame (GaussianVoxelMapCPU::insert analogue)."""
    cap = capacity if capacity is not None else frame.capacity
    vmap0 = empty_voxelmap(leaf, cap)
    return insert_frame(vmap0, frame)


def insert_frame(vmap: GaussianVoxelMap, frame: Frame) -> GaussianVoxelMap:
    """Merge a scan into the map (pure function).

    Steps: scan stats -> union with existing table (concat + sort + segment
    merge of raw moments) -> LRU-evict overflow by oldest last_seen.
    De-finalization: existing voxels re-expand mean/cov into raw moments so the
    merge is exact (matches GaussianVoxel::add + finalize semantics,
    reference: include/gtsam_points/types/gaussian_voxelmap_cpu.hpp).
    """
    cap = vmap.capacity
    new_keys, new_cnt, new_s1, new_s2 = _scan_stats(frame, vmap.leaf, cap)
    epoch = vmap.epoch + 1

    # de-finalize existing voxels to raw moments
    old_s1 = vmap.mean * vmap.count[:, None]
    old_s2 = (vmap.cov + jnp.einsum("ni,nj->nij", vmap.mean, vmap.mean)) * vmap.count[:, None, None]

    keys = jnp.concatenate([vmap.keys, new_keys])
    cnt = jnp.concatenate([vmap.count, new_cnt])
    s1 = jnp.concatenate([old_s1, new_s1])
    s2 = jnp.concatenate([old_s2, new_s2])
    seen = jnp.concatenate([vmap.last_seen, jnp.full((cap,), epoch, jnp.int32)])
    # new-scan entries with zero count are padding
    valid = (keys != vk.INVALID_KEY) & (cnt > 0)
    keys = jnp.where(valid, keys, vk.INVALID_KEY)

    order = jnp.argsort(keys)
    keys, cnt, s1, s2, seen, valid = (
        keys[order], cnt[order], s1[order], s2[order], seen[order], valid[order]
    )
    is_new = valid & jnp.concatenate([jnp.ones((1,), dtype=bool), keys[1:] != keys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n2 = keys.shape[0]
    slot = jnp.where(valid, seg, n2)

    m_cnt = jnp.zeros((n2 + 1,), jnp.float32).at[slot].add(cnt)[:n2]
    m_s1 = jnp.zeros((n2 + 1, 3), jnp.float32).at[slot].add(s1)[:n2]
    m_s2 = jnp.zeros((n2 + 1, 3, 3), jnp.float32).at[slot].add(s2)[:n2]
    m_seen = jnp.zeros((n2 + 1,), jnp.int32).at[slot].max(jnp.where(valid, seen, 0))[:n2]
    m_keys = jnp.full((n2 + 1,), vk.INVALID_KEY, jnp.int32).at[
        jnp.where(is_new, seg, n2)
    ].set(keys)[:n2]

    num_merged = jnp.maximum(seg[-1] + 1, 0)
    # LRU eviction down to capacity: keep the `cap` most-recent voxels.
    merged_valid = m_keys != vk.INVALID_KEY
    recency = jnp.where(merged_valid, m_seen, -1)
    overflow = num_merged > cap
    # rank voxels by recency (desc); evict beyond capacity only on overflow
    rank_order = jnp.argsort(-recency)  # most recent first, invalid last
    keep_flag = jnp.zeros((n2,), dtype=bool).at[rank_order[:cap]].set(True)
    keep = jnp.where(overflow, keep_flag & merged_valid, merged_valid)

    # compact kept voxels into [cap] slots, preserving key-sorted order
    m_keys = jnp.where(keep, m_keys, vk.INVALID_KEY)
    dest = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, cap)
    f_keys = jnp.full((cap + 1,), vk.INVALID_KEY, jnp.int32).at[dest].set(m_keys)[:cap]
    f_cnt = jnp.zeros((cap + 1,), jnp.float32).at[dest].set(m_cnt)[:cap]
    f_s1 = jnp.zeros((cap + 1, 3), jnp.float32).at[dest].set(m_s1)[:cap]
    f_s2 = jnp.zeros((cap + 1, 3, 3), jnp.float32).at[dest].set(m_s2)[:cap]
    f_seen = jnp.zeros((cap + 1,), jnp.int32).at[dest].set(m_seen)[:cap]

    denom = jnp.maximum(f_cnt, 1.0)
    mean = f_s1 / denom[:, None]
    cov = f_s2 / denom[:, None, None] - jnp.einsum("ni,nj->nij", mean, mean)

    return GaussianVoxelMap(
        leaf=vmap.leaf,
        keys=f_keys,
        count=f_cnt,
        mean=mean,
        cov=cov,
        last_seen=f_seen,
        epoch=epoch,
        num_voxels=jnp.minimum(num_merged, cap),
        hash_index=_build_hash_index(f_keys),
        packed=_pack_rows(f_keys, f_cnt, mean, cov),
    )


def lookup_voxels(vmap: GaussianVoxelMap, points: jax.Array, mask: jax.Array):
    """Batched voxel lookup for query points -> (voxel_idx [N], found [N]).

    Replaces the device hash probe (reference:
    include/gtsam_points/cuda/kernels/lookup_voxels.cuh:35-58) with binary
    search over the sorted key table."""
    keys = vk.point_keys(points, mask, vmap.leaf)
    idx_c, found = _probe(vmap.hash_index, vmap.keys, keys)
    return idx_c, found & mask


def voxelmap_overlap(vmap: GaussianVoxelMap, frame: Frame, T: jax.Array) -> jax.Array:
    """Fraction of frame points (transformed by T) that land in occupied voxels
    (reference: overlap family, src/gtsam_points/types/gaussian_voxelmap_cpu_funcs.cpp:126-190)."""
    from gtsam_points_tpu.utils import se3

    pts = se3.transform_points(T, frame.points)
    _, found = lookup_voxels(vmap, pts, frame.mask)
    n = jnp.maximum(frame.num_valid(), 1)
    return jnp.sum(found.astype(jnp.float32)) / n


def save_voxelmap(path: str, vmap: GaussianVoxelMap) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in vmap._asdict().items()})


def load_voxelmap(path: str) -> GaussianVoxelMap:
    data = np.load(path)
    return GaussianVoxelMap(**{k: jnp.asarray(data[k]) for k in data.files})
