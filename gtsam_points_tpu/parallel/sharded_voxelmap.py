"""Spatially-sharded Gaussian voxel map: each device OWNS a partition of the
voxel cells, so map capacity scales with the mesh instead of being bounded by
one chip's HBM (the round-1 replicated-map limitation; SURVEY.md §5.8).

Ownership is by hashed voxel key (murmur mix % num_shards): statistically
uniform across devices regardless of scene geometry, and a pure function of
the key, so insert and lookup need NO ownership directory. The scheme is
owner-computes:

- INSERT: every device runs the (cheap, data-parallel) key computation over
  the whole scan but inserts only its owned cells into its local sub-map.
  No cross-device traffic at all.
- LINEARIZE (VGICP): each device probes its local table with all source
  points — a point's voxel lives on exactly one shard, so per-point hits
  partition across devices — computes its partial Gauss-Newton blocks, and
  ONE psum of the ~1.8 KB `Linearized` payload (the LinearizedSystem6 monoid,
  reference: cuda/kernels/linearized_system.cuh:10-72) produces the exact
  replicated-map result on every device. Per-iteration collective traffic is
  independent of scan and map size.

This replaces the reference's single-GPU voxel hash
(src/gtsam_points/types/gaussian_voxelmap_gpu.cu:211-307) with a
multi-device partition the reference does not have.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsam_points_tpu.factors.base import factor_poses, register_factor
from gtsam_points_tpu.factors.linearized import Linearized
from gtsam_points_tpu.ops import planar
from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.ops.voxelmap import (
    GaussianVoxelMap,
    build_voxelmap,
    insert_frame,
    lookup_fetch_planar,
    lookup_voxels,
)
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3

_SHARD_MIX1 = np.uint32(0x9E3779B1)
_SHARD_MIX2 = np.uint32(0x85EBCA77)


def shard_of_keys(keys: jax.Array, num_shards: int) -> jax.Array:
    """Owning shard of each packed voxel key (independent murmur-style mix so
    shard choice is uncorrelated with the in-shard hash index)."""
    h = keys.astype(jnp.uint32)
    h = (h ^ (h >> 15)) * _SHARD_MIX1
    h = (h ^ (h >> 13)) * _SHARD_MIX2
    h = h ^ (h >> 16)
    return (h % np.uint32(num_shards)).astype(jnp.int32)


def _shard_mask(frame: Frame, leaf, num_shards: int, shard_id: jax.Array) -> jax.Array:
    keys = vk.point_keys(frame.points, frame.mask, leaf)
    return frame.mask & (shard_of_keys(keys, num_shards) == shard_id)


def build_sharded_voxelmap(
    frame: Frame,
    leaf: float,
    num_shards: int,
    capacity_per_shard: Optional[int] = None,
) -> GaussianVoxelMap:
    """-> GaussianVoxelMap pytree with a leading [num_shards] axis on every
    leaf (scalars become [num_shards]). Total capacity =
    num_shards * capacity_per_shard. Place on a mesh with place_sharded()."""
    cap = capacity_per_shard if capacity_per_shard is not None else frame.capacity

    def one(shard_id):
        smask = _shard_mask(frame, leaf, num_shards, shard_id)
        return build_voxelmap(frame.replace(mask=smask), leaf, capacity=cap)

    return jax.vmap(one)(jnp.arange(num_shards, dtype=jnp.int32))


def partition_frame_by_shard(
    frame: Frame,
    leaf,
    num_shards: int,
    capacity_per_shard: Optional[int] = None,
    slack: float = 1.5,
):
    """Pre-partition a scan by owning shard with ONE sort of the scan:
    -> (Frame with a leading [num_shards] axis and per-shard capacity S,
        overflow count of owned points dropped because a shard filled up).

    This is the weak-scaling fix for sharded insertion (VERDICT r2 item 6):
    instead of every shard sort-merging the WHOLE scan against its table,
    shard s receives only its owned slice (expected N/num_shards points), so
    per-device insert work drops ~1/num_shards. The hashed ownership is
    statistically uniform, so S = slack * ceil(N / num_shards) overflows with
    negligible probability; overflow is counted, mirroring the reference's
    tolerated insertion drops (types/gaussian_voxelmap_gpu.hpp:49-54)."""
    n = frame.capacity
    keys = vk.point_keys(frame.points, frame.mask, leaf)
    sid = jnp.where(frame.mask, shard_of_keys(keys, num_shards), num_shards)
    if capacity_per_shard is None:
        s_cap = -(-n // num_shards)
        s_cap = int(-(-int(s_cap * slack) // 128) * 128)
    else:
        s_cap = capacity_per_shard

    order = jnp.argsort(sid)  # owned points grouped by shard, padding last
    sid_sorted = sid[order]
    starts = jnp.searchsorted(sid_sorted, jnp.arange(num_shards, dtype=sid.dtype))
    pos = jnp.arange(n) - starts[jnp.clip(sid_sorted, 0, num_shards - 1)]
    owned = sid_sorted < num_shards
    keep = owned & (pos < s_cap)
    dest = jnp.where(keep, sid_sorted * s_cap + pos, num_shards * s_cap)
    overflow = jnp.sum((owned & ~keep).astype(jnp.int32))

    def scatter(x):
        if x is None:
            return None
        flat = jnp.zeros((num_shards * s_cap + 1,) + x.shape[1:], x.dtype)
        flat = flat.at[dest].set(x[order])
        return flat[:-1].reshape((num_shards, s_cap) + x.shape[1:])

    leaves = {
        f.name: scatter(getattr(frame, f.name))
        for f in dataclasses.fields(frame)
        if f.name not in ("mask", "aux")
    }
    mask = jnp.zeros((num_shards * s_cap + 1,), bool).at[dest].set(keep)[:-1]
    aux = (
        None
        if frame.aux is None
        else {k: scatter(v) for k, v in frame.aux.items()}
    )
    return (
        Frame(mask=mask.reshape(num_shards, s_cap), aux=aux, **leaves),
        overflow,
    )


def sharded_insert_frame(
    svmap: GaussianVoxelMap, frame: Frame, capacity_per_shard: Optional[int] = None
):
    """Insert a scan: ONE sort pre-partitions the scan by owning shard
    (partition_frame_by_shard), then each shard merges only its owned slice —
    per-device insert work scales as scan/num_shards. Under a sharded
    placement XLA runs shards on their owners with zero collective traffic.

    -> (new sharded map, overflow count of dropped owned points)."""
    num_shards = svmap.keys.shape[0]
    leaf = svmap.leaf[0]
    parts, overflow = partition_frame_by_shard(
        frame, leaf, num_shards, capacity_per_shard
    )
    new_map = jax.vmap(insert_frame)(svmap, parts)
    return new_map, overflow


def _check_shard_axis(svmap: GaussianVoxelMap, mesh: Mesh, axis) -> None:
    """The shard_map bodies take shard 0 of each per-device block
    (tree_map x[0]), which is only correct when the leading [num_shards] axis
    splits exactly one shard per device on `axis`. num_shards = 2x the axis
    size would silently drop half the map — asserted everywhere a sharded map
    meets a mesh (advisor r2 finding)."""
    names = (axis,) if isinstance(axis, str) else tuple(axis)
    size = 1
    for nm in names:
        size *= mesh.shape[nm]
    n_shards = svmap.keys.shape[0]
    if n_shards != size:
        raise ValueError(
            f"sharded voxelmap has {n_shards} shards but mesh axis {names} has "
            f"total size {size}; one shard per device is required"
        )


def place_sharded(svmap: GaussianVoxelMap, mesh: Mesh, axis="shard") -> GaussianVoxelMap:
    """device_put every leaf sharded on its leading [num_shards] axis.

    `axis` may be a mesh-axis name or a TUPLE of names: on a 2-level
    (host, chip) mesh (parallel/sharding.make_mesh_2d), pass
    axis=("host", "chip") to split the shard axis over ALL devices —
    num_shards must then equal n_hosts * chips_per_host, and the linearize
    psum becomes a hierarchical ICI-then-DCN reduction."""
    _check_shard_axis(svmap, mesh, axis)
    from gtsam_points_tpu.parallel.sharding import global_put

    def put(x):
        return global_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, svmap)


def sharded_num_voxels(svmap: GaussianVoxelMap) -> jax.Array:
    return jnp.sum(svmap.num_voxels)


def sharded_overlap(svmap: GaussianVoxelMap, frame: Frame, T: jax.Array) -> jax.Array:
    """Fraction of frame points landing in occupied voxels of ANY shard
    (reference: overlap family, gaussian_voxelmap_cpu_funcs.cpp:126-190)."""
    pts = se3.transform_points(T, frame.points)

    def one(vm):
        _, found = lookup_voxels(vm, pts, frame.mask)
        return found

    found_any = jnp.any(jax.vmap(one)(svmap), axis=0)
    return jnp.sum(found_any.astype(jnp.float32)) / jnp.maximum(frame.num_valid(), 1)


def _source_planar(source: Frame):
    pts_p = source.points.T
    if source.covs is not None:
        c = source.covs
        covs6 = jnp.stack(
            [c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]]
        )
    else:
        covs6 = None
    return pts_p, covs6


def _local_corr(vm: GaussianVoxelMap, pts_p, covs6, mask, delta, min_voxel_points):
    """Per-shard frozen correspondence payload at `delta`:
    (found, mu [3,N], W6 [6,N]) — hits only for voxels this shard owns."""
    pm = planar.transform(delta, pts_p)
    found, cnt, mu, C6 = lookup_fetch_planar(vm, pm, mask)
    found = found & (cnt >= min_voxel_points)
    if covs6 is not None:
        fused = C6 + planar.sym_rotate(delta[:3, :3], covs6)
    else:
        eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], C6.dtype) * 1e-3
        fused = C6 + eye6[:, None]
    return found, mu, planar.sym_inv(fused), pm


def linearize_vgicp_sharded(
    svmap: GaussianVoxelMap,
    source: Frame,
    delta: jax.Array,
    mesh: Mesh,
    axis: str = "shard",
    min_voxel_points: float = 5.0,
) -> Linearized:
    """Map-sharded fused VGICP linearization: local probe + local block
    reduction per shard, one psum of the Linearized payload. Bitwise-equal
    (up to f32 reduction order) to linearizing against the replicated map."""
    _check_shard_axis(svmap, mesh, axis)
    pts_p, covs6 = _source_planar(source)

    def local(vm_stack, pts_p, mask, delta, *maybe_covs6):
        vm = jax.tree_util.tree_map(lambda x: x[0], vm_stack)
        c6 = maybe_covs6[0] if maybe_covs6 else None
        found, mu, W6, pm = _local_corr(vm, pts_p, c6, mask, delta, min_voxel_points)
        lin = planar.linearize_point_system(pts_p, pm, pm - mu, W6, found, delta[:3, :3])
        return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), lin)

    extra = () if covs6 is None else (covs6,)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()) + tuple(P() for _ in extra),
        out_specs=P(),
    )
    return fn(svmap, pts_p, source.mask, delta, *extra)


@dataclasses.dataclass(frozen=True)
class VGICPShardedFactor:
    """VGICP factor whose target map is sharded over a device mesh.

    Same cost model as factors/vgicp.VGICPFactor (reference:
    factors/impl/integrated_vgicp_factor_impl.hpp:114-257), but the voxel map
    leaves carry a leading shard axis placed on `mesh`; linearize/error run as
    one shard_map with a psum of the block system. The per-device payload
    crossing the interconnect per call is ~1.8 KB (3x[6,6] + 2x[6] + 2
    scalars), independent of scan/map size."""

    voxelmaps: GaussianVoxelMap  # leading [D] axis on every leaf
    source: Frame  # replicated
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    min_voxel_points: float
    mesh: Mesh
    axis: str = "shard"

    @property
    def keys(self):
        return (self.target_key, self.source_key)

    def _delta(self, poses):
        T_t, T_s = factor_poses(self, poses)
        return se3.se3_inverse(T_t) @ T_s

    def linearize_with_error_fn(self, poses: jax.Array):
        delta0 = self._delta(poses)
        lin = linearize_vgicp_sharded(
            self.voxelmaps,
            self.source,
            delta0,
            self.mesh,
            self.axis,
            self.min_voxel_points,
        )

        pts_p, covs6 = _source_planar(self.source)
        mvp, axis, mesh = self.min_voxel_points, self.axis, self.mesh

        def err_fn(new_poses):
            nd = self._delta(new_poses)

            def local(vm_stack, pts_p, mask, d0, nd, *maybe_covs6):
                vm = jax.tree_util.tree_map(lambda x: x[0], vm_stack)
                c6 = maybe_covs6[0] if maybe_covs6 else None
                # frozen correspondences at the linearization point d0,
                # evaluated at nd (majorize-minimize; matches
                # factors/batch.py frozen_error)
                found, mu, W6, _ = _local_corr(vm, pts_p, c6, mask, d0, mvp)
                r = planar.transform(nd, pts_p) - mu
                return jax.lax.psum(planar.weighted_error(r, W6, found), axis)

            extra = () if covs6 is None else (covs6,)
            fn = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(axis), P(), P(), P(), P()) + tuple(P() for _ in extra),
                out_specs=P(),
            )
            return fn(self.voxelmaps, pts_p, self.source.mask, delta0, nd, *extra)

        return lin, err_fn

    def linearize(self, poses: jax.Array) -> Linearized:
        lin, _ = self.linearize_with_error_fn(poses)
        return lin

    def error(self, poses: jax.Array) -> jax.Array:
        _, err_fn = self.linearize_with_error_fn(poses)
        return err_fn(poses)


def make_vgicp_sharded_factor(
    target_key: int,
    source_key: int,
    svmap: GaussianVoxelMap,
    source: Frame,
    mesh: Mesh,
    axis: str = "shard",
    min_voxel_points: float = 5.0,
    fixed_target_pose: Optional[jax.Array] = None,
) -> VGICPShardedFactor:
    if fixed_target_pose is None:
        fixed_target_pose = jnp.eye(4, dtype=jnp.float32)
    return VGICPShardedFactor(
        voxelmaps=svmap,
        source=source,
        fixed_target_pose=fixed_target_pose,
        target_key=target_key,
        source_key=source_key,
        min_voxel_points=min_voxel_points,
        mesh=mesh,
        axis=axis,
    )


register_factor(
    VGICPShardedFactor,
    data_fields=["voxelmaps", "source", "fixed_target_pose"],
    meta_fields=["target_key", "source_key", "min_voxel_points", "mesh", "axis"],
)


def collective_bytes_per_linearize() -> int:
    """Per-iteration interconnect payload of the map-sharded linearize psum:
    the Linearized pytree (H_tt, H_ss, H_ts [6,6] + b_t, b_s [6] + error +
    num_inliers) in f32 — the measurable proxy for scaling efficiency when
    real multi-chip hardware is unavailable (BASELINE.md)."""
    return 4 * (3 * 36 + 2 * 6 + 2)
