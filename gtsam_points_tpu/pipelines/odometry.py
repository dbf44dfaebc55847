"""Scan-to-map and frame-to-frame odometry pipelines.

The reference ships these as examples built from its parts
(/root/reference/src/example/advanced_scan_matching.cpp — GICP odometry against
an incremental iVox map; demo_matching_cost_factors.cpp). Here each pipeline is
ONE jitted step function over an explicit state pytree: predict (constant
velocity) → register (unary factor + LM) → map update (pure-functional voxel
map insertion with keyframe gating via lax.cond). The whole SLAM front-end
loop runs on-device with a single host dispatch per scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.gicp import GICPFactor
from gtsam_points_tpu.factors.vgicp import VGICPFactor
from gtsam_points_tpu.ops.hash_grid import build_hash_grid
from gtsam_points_tpu.ops.voxelmap import (
    GaussianVoxelMap,
    empty_voxelmap,
    insert_frame,
    insert_frame_fast,
    insert_frame_incremental,
)
from gtsam_points_tpu.optim.graph import FactorGraph
from gtsam_points_tpu.optim.lm import LMParams, optimize_lm
from gtsam_points_tpu.types.frame import Frame, transform_frame
from gtsam_points_tpu.utils import se3


class OdometryState(NamedTuple):
    vmap: GaussianVoxelMap
    T_world: jax.Array  # [4, 4] current sensor pose
    T_delta: jax.Array  # [4, 4] last inter-frame motion (constant-velocity model)
    num_frames: jax.Array  # ()


@dataclasses.dataclass(frozen=True)
class OdometryParams:
    voxel_resolution: float = 1.0
    map_capacity: int = 262144
    min_voxel_points: float = 5.0
    max_iterations: int = 10
    keyframe_trans: float = 0.5  # insert into map when moved this far...
    keyframe_rot: float = 0.2  # ...or rotated this much since last insert
    full_insert_miss_fraction: float = 0.05  # structural merge when more than
    # this fraction of the scan lands in unmapped voxels
    scan_cells_capacity: int = 8192  # static bound on distinct voxels touched
    # by one scan (per-voxel pre-aggregated insert; ~5.2k at leaf 1.0 for a
    # 25k-point kitti scan — a scan exceeding it falls back to the
    # structural merge via the overflow flag)
    lm: Optional[LMParams] = None


@partial(jax.jit, static_argnums=(1, 2))
def _init_map(first_frame: Frame, voxel_resolution: float, map_capacity: int) -> GaussianVoxelMap:
    vmap = empty_voxelmap(voxel_resolution, map_capacity)
    return insert_frame(vmap, first_frame)


def init_odometry(first_frame: Frame, params: OdometryParams) -> OdometryState:
    # jitted as one program: eager insert_frame on the remote-TPU path costs
    # hundreds of ms of per-op dispatch round-trips
    vmap = _init_map(first_frame, params.voxel_resolution, params.map_capacity)
    eye = jnp.eye(4, dtype=jnp.float32)
    return OdometryState(vmap=vmap, T_world=eye, T_delta=eye, num_frames=jnp.int32(1))


@partial(jax.jit, static_argnums=(2,))
def odometry_register(state: OdometryState, frame: Frame, params: OdometryParams, T_pred_delta=None):
    """Registration half of the odometry step -> (T_new, T_delta, diagnostics)."""
    lm = params.lm or LMParams(max_iterations=params.max_iterations, max_inner_iterations=5)
    delta_pred = state.T_delta if T_pred_delta is None else T_pred_delta
    T_pred = state.T_world @ delta_pred

    factor = VGICPFactor(
        voxelmap=state.vmap,
        source=frame,
        fixed_target_pose=jnp.eye(4, dtype=jnp.float32),
        target_key=-1,
        source_key=0,
        min_voxel_points=params.min_voxel_points,
    )
    graph = FactorGraph([factor], num_poses=1)
    res = optimize_lm(graph, T_pred[None], lm)
    T_new = res.poses[0]
    ok = jnp.all(jnp.isfinite(T_new))
    T_new = jnp.where(ok, T_new, T_pred)
    T_delta = se3.se3_inverse(state.T_world) @ T_new
    diag = {"error": res.error, "iterations": res.status.num_iterations}
    return T_new, T_delta, diag


@partial(jax.jit, static_argnums=(4,))
def _update_map_gated(state: OdometryState, frame: Frame, T_new, T_delta, params: OdometryParams):
    """Device-side keyframe gating + cheap map scatter.
    -> (new_vmap, gated_miss): gated_miss is 0 when no insertion was due,
    else the fraction of the scan landing outside existing voxels."""
    xi = se3.se3_log(T_delta)
    moved = (
        (jnp.linalg.norm(xi[3:]) > params.keyframe_trans)
        | (jnp.linalg.norm(xi[:3]) > params.keyframe_rot)
        | (state.num_frames <= 1)
    )
    world_frame = transform_frame(T_new, frame)
    vm_fast, miss = insert_frame_fast(state.vmap, world_frame)
    vmap_new = jax.tree_util.tree_map(lambda a, b: jnp.where(moved, b, a), state.vmap, vm_fast)
    return vmap_new, jnp.where(moved, miss, 0.0), world_frame


@jax.jit
def _full_map_update(vmap, world_frame):
    return insert_frame(vmap, world_frame)


@partial(jax.jit, static_argnums=(2,))
def odometry_step(
    state: OdometryState,
    frame: Frame,
    params: OdometryParams,
    T_pred_delta=None,
    clusters=None,
):
    """VGICP scan-to-map odometry step -> (new_state, T_world, diagnostics).

    ONE jitted program, ZERO host syncs per step: registration, keyframe
    gating, and map insertion all run device-side (`lax.cond` picks the
    branch), so consecutive steps pipeline — on the remote-TPU path a host
    sync costs ~30 ms of round-trip latency, dwarfing the ~10 ms of device
    work. Insertion is the incremental append (ops/voxelmap.py:
    insert_frame_incremental); the expensive structural merge with LRU
    eviction runs only when the append would overflow map capacity.
    T_pred_delta optionally overrides the constant-velocity prediction
    (IMU / wheel-odometry prior).

    `clusters` (optional SourceClusters, SENSOR frame, built once per scan
    in preprocessing — registration/cluster.cluster_source at the map leaf)
    switches the WHOLE hot path to clusters: registration runs the weighted
    unary LM over ~5k cluster records instead of 25k points
    (factors/vgicp.VGICPClustersFactor), and the map insert takes the
    cluster-moment path (insert_clusters_incremental — the per-point insert
    is bound by the 25k-key sort, the cluster path sorts ~5.6k keys;
    measured 3.9 -> 2.4 ms on v5e)."""
    lm = params.lm or LMParams(max_iterations=params.max_iterations, max_inner_iterations=5)
    delta_pred = state.T_delta if T_pred_delta is None else T_pred_delta
    T_pred = state.T_world @ delta_pred

    if clusters is not None:
        from gtsam_points_tpu.factors.vgicp import VGICPClustersFactor

        factor = VGICPClustersFactor(
            voxelmap=state.vmap,
            clusters=clusters,
            fixed_target_pose=jnp.eye(4, dtype=jnp.float32),
            target_key=-1,
            source_key=0,
            min_voxel_points=params.min_voxel_points,
        )
    else:
        factor = VGICPFactor(
            voxelmap=state.vmap,
            source=frame,
            fixed_target_pose=jnp.eye(4, dtype=jnp.float32),
            target_key=-1,
            source_key=0,
            min_voxel_points=params.min_voxel_points,
        )
    graph = FactorGraph([factor], num_poses=1)
    res = optimize_lm(graph, T_pred[None], lm)
    T_new = res.poses[0]
    ok = jnp.all(jnp.isfinite(T_new))
    T_new = jnp.where(ok, T_new, T_pred)
    T_delta = se3.se3_inverse(state.T_world) @ T_new

    xi = se3.se3_log(T_delta)
    moved = (
        (jnp.linalg.norm(xi[3:]) > params.keyframe_trans)
        | (jnp.linalg.norm(xi[:3]) > params.keyframe_rot)
        | (state.num_frames <= 1)
    )
    world_frame = transform_frame(T_new, frame)

    def do_insert(vm):
        if clusters is not None:
            from gtsam_points_tpu.registration.cluster import (
                insert_clusters_incremental,
            )

            vm2, overflow = insert_clusters_incremental(vm, clusters, T_new)
        else:
            vm2, overflow = insert_frame_incremental(
                vm, world_frame, params.scan_cells_capacity
            )
        return (
            jax.lax.cond(overflow, lambda: insert_frame(vm, world_frame), lambda: vm2),
            overflow,
        )

    vmap_new, full_merge = jax.lax.cond(
        moved, do_insert, lambda vm: (vm, jnp.asarray(False)), state.vmap
    )
    new_state = OdometryState(
        vmap=vmap_new, T_world=T_new, T_delta=T_delta, num_frames=state.num_frames + 1
    )
    diag = {
        "error": res.error,
        "iterations": res.status.num_iterations,
        "inserted": moved,
        "full_merge": full_merge,
    }
    return new_state, T_new, diag


def make_odometry_stepper(params: OdometryParams, donate: bool = True):
    """Build the jitted STREAMING step: fn(state, frame, T_pred_delta=None)
    -> (new_state, T_world, diag).

    donate=True (default) donates the input state's buffers to the output,
    letting XLA reuse the ~30 MB of map buffers in place instead of
    allocating fresh ones every scan — the reference's analogue is mutating
    the voxel map in place (ann/impl/incremental_voxelmap_impl.hpp insert);
    donation is how a pure-functional update gets the same zero-copy
    allocation behavior under XLA. On the honest salted-fetch protocol
    (utils/benchtime.py REPLAY HAZARD note) the step's wall time is
    dominated by the LM registration itself, so donation is an allocator-
    hygiene property rather than a measured speedup on this image. The
    caller must treat the passed-in state as CONSUMED: keep only the
    returned state. Use donate=False when snapshotting states (e.g. for
    branching or rollback)."""
    kwargs = {"static_argnums": (2,)}
    if donate:
        kwargs["donate_argnums"] = (0,)
    stepped = jax.jit(odometry_step, **kwargs)

    def step(state: OdometryState, frame: Frame, T_pred_delta=None, clusters=None):
        return stepped(state, frame, params, T_pred_delta, clusters)

    return step


class FrameToFrameState(NamedTuple):
    prev: Frame
    prev_grid_points: jax.Array  # kept inside the factor's grid; stored via factor rebuild
    T_world: jax.Array
    T_delta: jax.Array


@partial(jax.jit, static_argnums=(4,))
def frame_to_frame_step(prev_frame: Frame, prev_grid, T_world, T_delta, max_iterations: int, frame: Frame):
    """GICP frame-to-frame odometry step (reference demo config 2):
    registers `frame` against `prev_frame` (with its prebuilt grid), returns
    (T_world_new, T_delta_new). Both frames must carry covariances."""
    T_pred_delta = T_delta  # constant velocity in the previous frame's coords

    factor = GICPFactor(
        target=prev_frame,
        source=frame,
        grid=prev_grid,
        fixed_target_pose=jnp.eye(4, dtype=jnp.float32),
        target_key=-1,
        source_key=0,
        max_corr_dist=2.0,
        num_neighbor_cells=27,
        max_points_per_cell=16,
    )
    graph = FactorGraph([factor], num_poses=1)
    res = optimize_lm(graph, T_pred_delta[None], LMParams(max_iterations=max_iterations, max_inner_iterations=5))
    delta = res.poses[0]
    ok = jnp.all(jnp.isfinite(delta))
    delta = jnp.where(ok, delta, T_pred_delta)
    T_new = T_world @ delta
    return T_new, delta, res.error
