"""Gaussian voxel maps: per-voxel (count, mean, covariance) statistics with
O(1) batched lookup, plus incremental insertion with LRU eviction.

TPU-native redesign of:
- GaussianVoxelMapCPU / GaussianVoxel running stats + finalize (reference:
  include/gtsam_points/types/gaussian_voxelmap_cpu.hpp:13-128),
- the GPU open-addressing voxel hash map built with atomicCAS bucket claiming
  (reference: src/gtsam_points/types/gaussian_voxelmap_gpu.cu:211-307),
- IncrementalVoxelMap's LRU eviction (reference:
  include/gtsam_points/ann/impl/incremental_voxelmap_impl.hpp:49-62).

Storage design: each voxel's record is its RAW MOMENTS (count, sum p, sum ppT)
packed into one 64-byte row. Consequences tuned to TPU cost model:
- lookup (hot VGICP path) = hash probe + ONE row gather; mean/cov finalize
  on the fly (elementwise — free next to the gather),
- the steady-state insertion (`insert_frame_fast`) is ONE row scatter-add —
  no sort, no hash rebuild, no de/re-finalization,
- the structural merge (`insert_frame`) handles new voxels + LRU eviction
  with a sort + segment reduction, and runs only when new territory appears.
Everything is a pure function over an immutable pytree, so whole odometry
loops stay inside jit. Saved/loaded as npz (analogue of save_compact/load,
reference: include/gtsam_points/types/gaussian_voxelmap_cpu.hpp:98-108).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.ops.hash_index import hash_key as _hash_key
from gtsam_points_tpu.types.frame import Frame

# moments row layout (16 f32 lanes = 64 bytes):
#   [0]     count
#   [1:4]   sum p
#   [4:10]  sum p pT upper triangle (xx, xy, xz, yy, yz, zz) (+ sum covs)
#   [10]    sum intensity   (reference: GaussianVoxel accumulates intensity,
#           types/gaussian_voxelmap_cpu.hpp:13-128)
#   [11:16] pad
_MOM_LANES = 16

# Bucketed probe-table record layout (16 f32 lanes; 4 records per 64-lane
# bucket row):
#   [0]     packed voxel key, int32 BITCAST to f32 (compare-only — 30-bit keys
#           don't fit a f32 mantissa as values)
#   [1]     canonical row index in `keys`/`moments`, stored as a f32 VALUE
#           (exact: capacity < 2^24), so the matching record can be selected
#           with a mask-weighted sum instead of a second gather
#   [2:13]  moments lanes 0..10 (count, sum p, sum ppT, sum intensity)
#   [13:16] pad
_REC_LANES = 16
_BUCKET_SLOTS = 8
_BUCKET_LANES = _BUCKET_SLOTS * _REC_LANES  # 128 lanes = 512 B per gather row


def _n_buckets(capacity: int) -> int:
    """Power-of-two bucket count with >= 2x capacity slot headroom. TPU
    gather cost is per-GATHER (128-lane rows measure the same as 64-lane,
    /tmp profile, round 4), so 8 deep buckets cost nothing extra and push
    the per-bucket Poisson overflow (dropped voxels) to ~1e-8 at typical
    load and ~0.2% at absolute full capacity."""
    m = 512
    while m * _BUCKET_SLOTS < 2 * capacity:
        m *= 2
    return m


class GaussianVoxelMap(NamedTuple):
    """Sorted-key Gaussian voxel map (static capacity C).

    leaf:      () float32 voxel edge length
    keys:      [C] int32 sorted packed voxel keys (INVALID_KEY padded)
    moments:   [C, 16] f32 packed raw-moment rows (see layout above)
    last_seen: [C] int32 insertion-epoch of last touch (for LRU)
    epoch:     () int32 current insertion counter
    num_voxels:() int32
    table:     [m, 128] f32 bucketed ONE-GATHER probe table: bucket =
               murmur(key) & (m-1); each bucket row packs 8 complete records
               (key bitcast, row, moments — layout above), so the hot lookup
               is a single 128-lane row gather that both verifies the key and
               delivers the voxel statistics. Measured on TPU v5e this
               replaced the round-3 double-hash probe (2 gathers) + moment
               row gather (1 more) at ~0.21 ms/scan with ~0.04 ms/scan
               (gather cost is per-gather, not per-lane). Bucket-overflow
               keys (>8 per bucket, ~1e-8 at typical load) are dropped,
               mirroring the reference's tolerated insertion drops
               (types/gaussian_voxelmap_gpu.hpp:49-54).
    """

    leaf: jax.Array
    keys: jax.Array
    moments: jax.Array
    last_seen: jax.Array
    epoch: jax.Array
    num_voxels: jax.Array
    table: jax.Array

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    # ---- finalized views (derived; elementwise over [C]) ----
    @property
    def count(self) -> jax.Array:
        return self.moments[:, 0]

    @property
    def mean(self) -> jax.Array:
        return finalize_mean(self.moments)

    @property
    def cov(self) -> jax.Array:
        return finalize_cov(self.moments)

    @property
    def intensity(self) -> jax.Array:
        return finalize_intensity(self.moments)

    def as_frame(self, with_normals: bool = False) -> Frame:
        """Expose voxel statistics as a Frame (the reference exposes voxelmaps
        through frame-traits the same way, ann/impl/incremental_voxelmap_impl.hpp:163-228).
        Per-voxel mean intensity rides along, so colored/intensity factors
        consume a voxel map directly; `with_normals` additionally derives
        per-voxel normals from the covariance (smallest eigenvector), which
        colored/photometric factors need on the target side."""
        valid = self.keys != vk.INVALID_KEY
        pts = jnp.where(valid[:, None], self.mean, 0.0)
        covs = self.cov
        normals = None
        if with_normals:
            from gtsam_points_tpu.ops.eigh3 import eigh3

            _, vecs = eigh3(covs + 1e-9 * jnp.eye(3, dtype=covs.dtype))
            normals = jnp.where(valid[:, None], vecs[..., 0], 0.0)
        return Frame(
            points=pts, mask=valid, covs=covs, normals=normals, intensities=self.intensity
        )


def finalize_mean(moments: jax.Array) -> jax.Array:
    cnt = jnp.maximum(moments[..., 0], 1.0)
    return moments[..., 1:4] / cnt[..., None]


def finalize_intensity(moments: jax.Array) -> jax.Array:
    """Per-voxel mean intensity (0 where no intensities were accumulated)."""
    cnt = jnp.maximum(moments[..., 0], 1.0)
    return moments[..., 10] / cnt


def finalize_cov(moments: jax.Array) -> jax.Array:
    cnt = jnp.maximum(moments[..., 0], 1.0)
    mu = moments[..., 1:4] / cnt[..., None]
    s = moments[..., 4:10] / cnt[..., None]
    xx = s[..., 0] - mu[..., 0] * mu[..., 0]
    xy = s[..., 1] - mu[..., 0] * mu[..., 1]
    xz = s[..., 2] - mu[..., 0] * mu[..., 2]
    yy = s[..., 3] - mu[..., 1] * mu[..., 1]
    yz = s[..., 4] - mu[..., 1] * mu[..., 2]
    zz = s[..., 5] - mu[..., 2] * mu[..., 2]
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def point_moments(
    points: jax.Array,
    covs: Optional[jax.Array],
    w: jax.Array,
    intensities: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-point moment rows [N, 16] weighted by w (0/1 mask)."""
    p = points
    upper = jnp.stack(
        [
            p[:, 0] * p[:, 0], p[:, 0] * p[:, 1], p[:, 0] * p[:, 2],
            p[:, 1] * p[:, 1], p[:, 1] * p[:, 2], p[:, 2] * p[:, 2],
        ],
        axis=-1,
    )
    if covs is not None:
        upper = upper + jnp.stack(
            [covs[:, 0, 0], covs[:, 0, 1], covs[:, 0, 2], covs[:, 1, 1], covs[:, 1, 2], covs[:, 2, 2]],
            axis=-1,
        )
    inten = (
        intensities[:, None]
        if intensities is not None
        else jnp.zeros((p.shape[0], 1), jnp.float32)
    )
    pad = jnp.zeros((p.shape[0], _MOM_LANES - 11), jnp.float32)
    rows = jnp.concatenate(
        [jnp.ones((p.shape[0], 1), jnp.float32), p, upper, inten, pad], axis=-1
    )
    return rows * w[:, None]


def _empty_record() -> np.ndarray:
    """One empty probe-table record: key = INVALID bitcast, row = -1, rest 0."""
    rec = np.zeros((_REC_LANES,), np.float32)
    rec[0] = np.int32(vk.INVALID_KEY).view(np.float32)
    rec[1] = -1.0
    return rec


def _make_records(keys: jax.Array, rows: jax.Array, moments: jax.Array) -> jax.Array:
    """[C] keys + [C] row ids + [C,16] moments -> [C,16] probe records."""
    kf = jax.lax.bitcast_convert_type(keys, jnp.float32)[:, None]
    rf = rows.astype(jnp.float32)[:, None]
    pad = jnp.zeros((keys.shape[0], _REC_LANES - 13), jnp.float32)
    return jnp.concatenate([kf, rf, moments[:, :11], pad], axis=-1)


def build_probe_table(keys: jax.Array, moments: jax.Array) -> jax.Array:
    """Claim bucket slots for every valid key (first-8-per-bucket, sorted
    deterministic priority; overflow dropped) and scatter complete records.
    The TPU-native analogue of the reference's atomicCAS bucket claiming
    (src/gtsam_points/types/gaussian_voxelmap_gpu.cu:211-307): one stable
    sort by bucket id replaces the atomic race, so the result is
    deterministic."""
    C = keys.shape[0]
    m = _n_buckets(C)
    valid = keys != vk.INVALID_KEY
    h = _hash_key(keys, 0, m)
    hv = jnp.where(valid, h, m)
    order = jnp.argsort(hv)
    sh = hv[order]
    sval = valid[order]
    idx = jnp.arange(C, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sh[1:] != sh[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_first, idx, 0))
    rank = idx - run_start
    n_slots = m * _BUCKET_SLOTS
    slot = jnp.where(sval & (rank < _BUCKET_SLOTS), sh * _BUCKET_SLOTS + rank, n_slots)

    recs = _make_records(keys, jnp.arange(C, dtype=jnp.int32), moments)[order]
    empty = jnp.broadcast_to(jnp.asarray(_empty_record()), (n_slots + 1, _REC_LANES))
    flat = jnp.array(empty).at[slot].set(recs)[:n_slots]
    return flat.reshape(m, _BUCKET_LANES)


def table_probe(table: jax.Array, query_keys: jax.Array):
    """ONE-gather probe: -> (row [..], found [..], pick [.., 16], slot [..]).

    `pick` is the matching record (zeros when not found); `slot` the flat
    table slot (for scatter-backs). Replaces the reference's device hash
    probe + per-field loads (cuda/kernels/lookup_voxels.cuh:35-58)."""
    m = table.shape[0]
    h = _hash_key(query_keys, 0, m)
    rec = table[h]  # [..., 64] — the single gather
    rec4 = rec.reshape(rec.shape[:-1] + (_BUCKET_SLOTS, _REC_LANES))
    kl = jax.lax.bitcast_convert_type(rec4[..., 0], jnp.int32)
    sel = (kl == query_keys[..., None]) & (query_keys != vk.INVALID_KEY)[..., None]
    found = jnp.any(sel, axis=-1)
    pick = jnp.sum(rec4 * sel.astype(table.dtype)[..., None], axis=-2)
    row = pick[..., 1].astype(jnp.int32)  # row stored as f32 VALUE (exact < 2^24)
    sub = jnp.argmax(sel, axis=-1).astype(jnp.int32)
    slot = h * _BUCKET_SLOTS + sub
    return jnp.maximum(row, 0), found, pick, slot


def lookup_rows(vmap: GaussianVoxelMap, query_keys: jax.Array):
    """-> (row [..], found [..]) for arbitrary packed voxel keys (the
    row-index probe used by neighborhood ops: features, colored gradients)."""
    row, found, _, _ = table_probe(vmap.table, query_keys)
    return row, found


def lookup_fetch(vmap: GaussianVoxelMap, points: jax.Array, mask: jax.Array):
    """Fused probe + record fetch for the hot VGICP path:
    -> (found [N], count [N], mean [N,3], cov [N,3,3]).
    Replaces the reference device probe + per-field loads
    (cuda/kernels/lookup_voxels.cuh:35-58) with ONE row gather."""
    keys = vk.point_keys(points, mask, vmap.leaf)
    _, found, pick, _ = table_probe(vmap.table, keys)
    rows = jnp.concatenate(
        [pick[:, 2:13], jnp.zeros((pick.shape[0], _MOM_LANES - 11), pick.dtype)], axis=-1
    )
    found = found & mask
    return found, rows[:, 0], finalize_mean(rows), finalize_cov(rows)


def empty_voxelmap(leaf: float, capacity: int) -> GaussianVoxelMap:
    m = _n_buckets(capacity)
    empty = jnp.broadcast_to(
        jnp.asarray(_empty_record()), (m * _BUCKET_SLOTS, _REC_LANES)
    ).reshape(m, _BUCKET_LANES)
    return GaussianVoxelMap(
        leaf=jnp.float32(leaf),
        keys=jnp.full((capacity,), vk.INVALID_KEY, dtype=jnp.int32),
        moments=jnp.zeros((capacity, _MOM_LANES), dtype=jnp.float32),
        last_seen=jnp.zeros((capacity,), dtype=jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        num_voxels=jnp.zeros((), jnp.int32),
        table=jnp.array(empty),
    )


def _scan_moments(frame: Frame, leaf, capacity: int):
    """Per-voxel moment rows of one scan: (keys [cap], moments [cap, 16])."""
    keys = vk.point_keys(frame.points, frame.mask, leaf)
    order = jnp.argsort(keys)
    skeys = keys[order]
    valid = skeys != vk.INVALID_KEY
    is_new = valid & jnp.concatenate([jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    slot = jnp.where(valid, jnp.minimum(seg, capacity), capacity)

    rows = point_moments(frame.points, frame.covs, frame.mask.astype(jnp.float32), frame.intensities)[order]
    mom = jnp.zeros((capacity + 1, _MOM_LANES), jnp.float32).at[slot].add(rows)[:capacity]
    out_keys = jnp.full((capacity + 1,), vk.INVALID_KEY, jnp.int32).at[
        jnp.where(is_new, jnp.minimum(seg, capacity), capacity)
    ].set(skeys)[:capacity]
    return out_keys, mom


def build_voxelmap(frame: Frame, leaf: float, capacity: Optional[int] = None) -> GaussianVoxelMap:
    """One-shot map from a single frame (GaussianVoxelMapCPU::insert analogue)."""
    cap = capacity if capacity is not None else frame.capacity
    vmap0 = empty_voxelmap(leaf, cap)
    return insert_frame(vmap0, frame)


def insert_frame(vmap: GaussianVoxelMap, frame: Frame) -> GaussianVoxelMap:
    """Structural merge of a scan into the map (pure function).

    Steps: scan moments -> union with the existing table (concat + sort +
    segment-add of moment rows) -> LRU-evict overflow by oldest last_seen ->
    hash-index rebuild. Exact merge semantics (matches GaussianVoxel::add +
    finalize, reference: include/gtsam_points/types/gaussian_voxelmap_cpu.hpp).
    """
    cap = vmap.capacity
    new_keys, new_mom = _scan_moments(frame, vmap.leaf, cap)
    epoch = vmap.epoch + 1

    keys = jnp.concatenate([vmap.keys, new_keys])
    mom = jnp.concatenate([vmap.moments, new_mom])
    seen = jnp.concatenate([vmap.last_seen, jnp.full((cap,), epoch, jnp.int32)])
    valid = (keys != vk.INVALID_KEY) & (mom[:, 0] > 0)
    keys = jnp.where(valid, keys, vk.INVALID_KEY)

    order = jnp.argsort(keys)
    keys, mom, seen, valid = keys[order], mom[order], seen[order], valid[order]
    is_new = valid & jnp.concatenate([jnp.ones((1,), dtype=bool), keys[1:] != keys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n2 = keys.shape[0]
    slot = jnp.where(valid, seg, n2)

    m_mom = jnp.zeros((n2 + 1, _MOM_LANES), jnp.float32).at[slot].add(mom)[:n2]
    m_seen = jnp.zeros((n2 + 1,), jnp.int32).at[slot].max(jnp.where(valid, seen, 0))[:n2]
    m_keys = jnp.full((n2 + 1,), vk.INVALID_KEY, jnp.int32).at[
        jnp.where(is_new, seg, n2)
    ].set(keys)[:n2]

    num_merged = jnp.maximum(seg[-1] + 1, 0)
    merged_valid = m_keys != vk.INVALID_KEY
    recency = jnp.where(merged_valid, m_seen, -1)
    overflow = num_merged > cap
    rank_order = jnp.argsort(-recency)  # most recent first, invalid last
    keep_flag = jnp.zeros((n2,), dtype=bool).at[rank_order[:cap]].set(True)
    keep = jnp.where(overflow, keep_flag & merged_valid, merged_valid)

    m_keys = jnp.where(keep, m_keys, vk.INVALID_KEY)
    dest = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, cap)
    f_keys = jnp.full((cap + 1,), vk.INVALID_KEY, jnp.int32).at[dest].set(m_keys)[:cap]
    f_mom = jnp.zeros((cap + 1, _MOM_LANES), jnp.float32).at[dest].set(m_mom)[:cap]
    f_seen = jnp.zeros((cap + 1,), jnp.int32).at[dest].set(m_seen)[:cap]

    return GaussianVoxelMap(
        leaf=vmap.leaf,
        keys=f_keys,
        moments=f_mom,
        last_seen=f_seen,
        epoch=epoch,
        num_voxels=jnp.minimum(num_merged, cap),
        table=build_probe_table(f_keys, f_mom),
    )


def insert_frame_fast(vmap: GaussianVoxelMap, frame: Frame):
    """Steady-state insertion: ONE row scatter-add into voxels that already
    exist (hash probe; no sort, no hash rebuild). Points landing in unmapped
    voxels are dropped and counted.

    -> (new_map, miss_fraction). Callers run the structural `insert_frame`
    merge when miss_fraction is large (new territory) — see
    pipelines/odometry.py. This mirrors the reference's split between cheap
    per-scan voxel updates and structural growth (iVox insert vs rehash).
    """
    keys = vk.point_keys(frame.points, frame.mask, vmap.leaf)
    row, found, _, tslot = table_probe(vmap.table, keys)
    w = (found & frame.mask).astype(jnp.float32)
    cap = vmap.capacity
    slot = jnp.where(w > 0, row, cap)

    rows = point_moments(frame.points, frame.covs, w, frame.intensities)
    mom = jnp.concatenate([vmap.moments, jnp.zeros((1, _MOM_LANES), jnp.float32)]).at[slot].add(rows)[:cap]

    # mirror the moment deltas into the probe-table records (key/row lanes
    # ride along as zeros, so a full-record scatter-add stays aligned)
    n_slots = vmap.table.shape[0] * _BUCKET_SLOTS
    delta = jnp.concatenate(
        [jnp.zeros((rows.shape[0], 2), jnp.float32), rows[:, :11],
         jnp.zeros((rows.shape[0], _REC_LANES - 13), jnp.float32)], axis=-1
    )
    tslot = jnp.where(w > 0, tslot, n_slots)
    flat = jnp.concatenate(
        [vmap.table.reshape(n_slots, _REC_LANES), jnp.zeros((1, _REC_LANES), jnp.float32)]
    ).at[tslot].add(delta)[:n_slots]

    epoch = vmap.epoch + 1
    seen = jnp.concatenate([vmap.last_seen, jnp.zeros((1,), jnp.int32)]).at[slot].max(epoch)[:cap]
    n_valid = jnp.maximum(frame.num_valid().astype(jnp.float32), 1.0)
    miss_fraction = 1.0 - jnp.sum(w) / n_valid
    new_map = GaussianVoxelMap(
        leaf=vmap.leaf,
        keys=vmap.keys,
        moments=mom,
        last_seen=seen,
        epoch=epoch,
        num_voxels=vmap.num_voxels,
        table=flat.reshape(vmap.table.shape),  # keys unchanged; values updated
    )
    return new_map, miss_fraction


def lookup_voxels(vmap: GaussianVoxelMap, points: jax.Array, mask: jax.Array):
    """Batched voxel lookup for query points -> (voxel_idx [N], found [N]).

    Replaces the device hash probe (reference:
    include/gtsam_points/cuda/kernels/lookup_voxels.cuh:35-58) with the
    bucketed one-gather probe."""
    keys = vk.point_keys(points, mask, vmap.leaf)
    idx_c, found, _, _ = table_probe(vmap.table, keys)
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
    fields = {k: jnp.asarray(data[k]) for k in data.files}
    fields.pop("hash_index", None)  # legacy double-hash files: rebuild below
    if "table" not in fields:
        fields["table"] = build_probe_table(fields["keys"], fields["moments"])
    return GaussianVoxelMap(**fields)


def lookup_fetch_planar(vmap: GaussianVoxelMap, moved_p: jax.Array, mask: jax.Array):
    """Planar-layout lookup for the hot VGICP path: moved_p [3, N] ->
    (found [N], count [N], mean [3, N], cov6 [6, N]).

    Same one-gather probe as lookup_fetch, but the matched [N, 16] records
    are transposed ONCE to [16, N] and finalized with sublane slices —
    no [N, 3] / [N, 3, 3] minor-dim relayouts (see ops/planar.py)."""
    keys = vk.point_keys_planar(moved_p, mask, vmap.leaf)
    _, found, pick, _ = table_probe(vmap.table, keys)
    rT = pick.T[2:13]  # [11, N] moments lanes 0..10 (planar)
    found = found & mask
    cnt = rT[0]
    safe = jnp.maximum(cnt, 1.0)
    mu = rT[1:4] / safe
    s6 = rT[4:10] / safe
    mu2 = jnp.stack(
        [mu[0] * mu[0], mu[0] * mu[1], mu[0] * mu[2], mu[1] * mu[1], mu[1] * mu[2], mu[2] * mu[2]]
    )
    return found, cnt, mu, s6 - mu2


def insert_frame_incremental(
    vmap: GaussianVoxelMap, frame: Frame, scan_cells_capacity: int | None = None
):
    """Fully-incremental insertion: scatter-add moments into existing voxels
    AND append newly-seen voxels — no full-map re-sort, no host sync, jittable
    as part of a larger step (the odometry pipeline wraps it in lax.cond).

    PER-VOXEL PRE-AGGREGATION (round 5, VERDICT r4 item 2): the scan's
    moment rows are segment-summed per voxel key FIRST (one scan sort + one
    scan-row scatter into a compact [scan_cells_capacity] accumulator), and
    every subsequent map/table scatter operates on UNIQUE CELLS (~5k for a
    25k-point scan at leaf 1.0) instead of points — TPU scatters cost
    per-ROW, so this cuts the dominant insert cost by ~#points/#cells. The
    reference's GPU insert does the same per-voxel accumulation before
    touching the map (types/gaussian_voxelmap_gpu.cu:211-307).

    `scan_cells_capacity` (STATIC) bounds distinct voxels per scan; None
    defaults to the scan's point capacity (never drops). When a scan
    exceeds it, the overflow flag is raised and callers fall back to the
    structural `insert_frame` (odometry does this automatically).

    The probe table updates INCREMENTALLY (round 4 — the previous full
    rebuild sorted + re-scattered the whole 131k-capacity map every insert):
    existing records take scatter-added moment deltas at their known slots,
    and new voxels append records into their bucket's contiguous free tail
    (build_probe_table packs records from slot 0, and only full rebuilds
    ever remove them, so first-free = occupancy). Keys whose bucket is full
    are dropped from the table — the analogue of the reference's tolerated
    insertion drops (types/gaussian_voxelmap_gpu.hpp:49-54,
    `target_points_drop_rate`).

    -> (new_vmap, overflow): `overflow` is True when the append ran past
    map capacity or the scan exceeded scan_cells_capacity (callers should
    then run the structural `insert_frame`, which LRU-evicts; appended rows
    past capacity are dropped here).
    """
    n = frame.points.shape[0]
    ucap = scan_cells_capacity if scan_cells_capacity is not None else n
    keys = vk.point_keys(frame.points, frame.mask, vmap.leaf)
    rows = point_moments(
        frame.points, frame.covs, frame.mask.astype(jnp.float32), frame.intensities
    )
    return insert_rows_incremental(vmap, keys, rows, ucap)


def insert_rows_incremental(
    vmap: GaussianVoxelMap, keys: jax.Array, rows: jax.Array, ucap: int
):
    """Core of the incremental insert: merge arbitrary per-row moment
    contributions ([M] keys, [M, 16] moment rows — per-point rows from
    insert_frame_incremental, or per-CLUSTER rows from
    insert_clusters_incremental where M is ~5x smaller and the dominating
    key sort shrinks with it). `ucap` (STATIC) bounds distinct keys per
    call. -> (new_vmap, overflow)."""
    cap = vmap.capacity
    epoch = vmap.epoch + 1

    # ---- 0) per-voxel pre-aggregation: the ONLY input-row-sized ops are one
    # key sort, one moment-row gather, and two compaction scatters; all map
    # and table updates below run at ucap rows.
    order = jnp.argsort(keys)
    skeys = keys[order]
    valid = skeys != vk.INVALID_KEY
    is_new = valid & jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # unique-cell id per row
    num_unique = jnp.maximum(seg[-1] + 1, 0)
    rows_mom = rows[order]
    uslot = jnp.where(valid, jnp.minimum(seg, ucap), ucap)
    umom = jnp.zeros((ucap + 1, _MOM_LANES), jnp.float32).at[uslot].add(rows_mom)[:ucap]
    ukeys = jnp.full((ucap + 1,), vk.INVALID_KEY, jnp.int32).at[
        jnp.where(is_new, jnp.minimum(seg, ucap), ucap)
    ].set(skeys)[:ucap]
    uvalid = ukeys != vk.INVALID_KEY

    row, found, _, tslot = table_probe(vmap.table, ukeys)
    found = found & uvalid

    # 1+2) ONE combined scatter per map array (round 5: TPU scatters carry a
    # large fixed cost per scatter op, so exist-accumulate and new-append —
    # which touch DISJOINT rows — share one scatter each). All scatters use
    # mode="drop" with an out-of-bounds sentinel index instead of the
    # concat-a-sentinel-row idiom: the concats forced full copies of the
    # map-sized buffers (~50 MB per insert at 131k capacity) before every
    # update, dominating the streaming insert cost.
    new_mask = uvalid & jnp.logical_not(found)
    rank_new = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    num_new = jnp.sum(new_mask.astype(jnp.int32))
    dest = jnp.where(new_mask, vmap.num_voxels + rank_new, cap)  # capped below
    overflow = ((vmap.num_voxels + num_new) > cap) | (num_unique > ucap)
    dest = jnp.minimum(dest, cap)

    touched = found | new_mask
    slot_all = jnp.where(found, row, dest)  # exist row | append row | cap (drop)
    moments = vmap.moments.at[slot_all].add(
        jnp.where(touched[:, None], umom, 0.0), mode="drop"
    )
    last_seen = vmap.last_seen.at[slot_all].max(
        jnp.where(touched, epoch, 0), mode="drop"
    )
    new_keys = vmap.keys.at[dest].set(
        jnp.where(new_mask, ukeys, vk.INVALID_KEY), mode="drop"
    )

    # 3) INCREMENTAL probe-table update (unique-cell-sized work)
    m = vmap.table.shape[0]
    n_slots = m * _BUCKET_SLOTS
    # bucket occupancy gather MUST precede the table updates: reading the
    # original table after `flat` exists would keep both versions alive and
    # force a full 16 MB table copy (XLA cannot update in place while the
    # stale version is still read)
    hb = _hash_key(ukeys, 0, m)
    hkey = jnp.where(new_mask, hb, m)
    order2 = jnp.argsort(hkey)  # ucap-row sort, not scan-row
    hb2 = hkey[order2]
    brow = vmap.table[jnp.where(hb2 < m, hb2, 0)]  # [ucap, 128] one gather
    k8 = jax.lax.bitcast_convert_type(
        brow.reshape(ucap, _BUCKET_SLOTS, _REC_LANES)[:, :, 0], jnp.int32
    )
    occ = jnp.sum((k8 != vk.INVALID_KEY).astype(jnp.int32), axis=1)
    flat = vmap.table.reshape(n_slots, _REC_LANES)
    # existing records and appended records both receive a FULLY-FORMED
    # record built from the post-update moments, so one scatter-SET serves
    # both (the previous add-deltas-then-set-appends pair paid two map-table
    # scatters; an add cannot cover the append because the free tail holds
    # empty records whose key lane is the INVALID bitcast = NaN). Slot sets
    # are disjoint: tslot addresses occupied slots, the append lands in the
    # bucket's free tail at (first-free + within-bucket rank).
    idx = jnp.arange(ucap, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones((1,), bool), hb2[1:] != hb2[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_first, idx, 0))
    rank = idx - run_start
    dest2 = dest[order2]
    found2 = found[order2]
    ok_new = (hb2 < m) & (occ + rank < _BUCKET_SLOTS) & (dest2 < cap)
    slot_new = jnp.where(ok_new, hb2 * _BUCKET_SLOTS + occ + rank, n_slots)
    slot_tab = jnp.where(found2, tslot[order2], slot_new)
    maprow2 = jnp.where(found2, row[order2], dest2)
    recs = _make_records(
        ukeys[order2], maprow2, moments[jnp.minimum(maprow2, cap - 1)]
    )
    # invalid entries carry the out-of-bounds sentinel index -> dropped
    flat = flat.at[slot_tab].set(recs, mode="drop")
    table = flat.reshape(m, _BUCKET_LANES)

    out = GaussianVoxelMap(
        leaf=vmap.leaf,
        keys=new_keys,
        moments=moments,
        last_seen=last_seen,
        epoch=epoch,
        num_voxels=jnp.minimum(vmap.num_voxels + num_new, cap),
        table=table,
    )
    return out, overflow
