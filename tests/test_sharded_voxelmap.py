"""Map-sharded voxel map on the 8-virtual-device CPU mesh: the sharded
linearize must match the replicated-map result within f32 reduction tolerance
(VERDICT r1 item 2 acceptance), insertion must partition cells without loss,
and the sharded factor must optimize inside a normal FactorGraph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import PriorFactor, make_vgicp_factor
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.ops.voxelmap import build_voxelmap, insert_frame, lookup_voxels
from gtsam_points_tpu.parallel import (
    build_sharded_voxelmap,
    linearize_vgicp_sharded,
    make_vgicp_sharded_factor,
    place_sharded,
    shard_of_keys,
    sharded_insert_frame,
    sharded_num_voxels,
    sharded_overlap,
)
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3
from jax.sharding import Mesh


def _mesh(axis="shard"):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(devs[:8]), (axis,))


def _scene(n=6144, seed=0):
    rng = np.random.RandomState(seed)
    pts = []
    for ax in range(3):
        p = rng.rand(n // 3, 3).astype(np.float32) * 20 - 10
        p[:, ax] = np.sign(p[:, ax]) * 10 + rng.randn(n // 3).astype(np.float32) * 0.05
        pts.append(p)
    pts = np.concatenate(pts)
    covs = np.tile((0.01 * np.eye(3, dtype=np.float32))[None], (n, 1, 1))
    return make_frame(pts, covs=covs, capacity=n)


def test_shard_assignment_partitions():
    keys = jnp.arange(0, 100000, 7, dtype=jnp.int32)
    s = np.asarray(shard_of_keys(keys, 8))
    assert s.min() >= 0 and s.max() < 8
    # roughly balanced (uniform mix): each shard within 3x of fair share
    counts = np.bincount(s, minlength=8)
    assert counts.min() > len(s) / 8 / 3


def test_sharded_build_matches_replicated_lookup():
    frame = _scene()
    vmap = build_voxelmap(frame, 1.0)
    svmap = build_sharded_voxelmap(frame, 1.0, num_shards=8, capacity_per_shard=frame.capacity // 4)

    # total voxel count preserved
    assert int(sharded_num_voxels(svmap)) == int(vmap.num_voxels)

    # every query found in the replicated map is found in exactly one shard
    q = frame.points[:512]
    qm = frame.mask[:512]
    _, found_rep = lookup_voxels(vmap, q, qm)

    def one(vm):
        _, f = lookup_voxels(vm, q, qm)
        return f

    found_per_shard = np.asarray(jax.vmap(one)(svmap))
    np.testing.assert_array_equal(found_per_shard.sum(0) > 0, np.asarray(found_rep))
    assert (found_per_shard.sum(0) <= 1).all()


def test_sharded_linearize_matches_replicated():
    mesh = _mesh()
    frame = _scene()
    xi = np.asarray([0.02, -0.01, 0.03, 0.2, -0.1, 0.15], dtype=np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    src = make_frame(
        np.asarray(se3.transform_points(se3.se3_inverse(T), frame.points)),
        covs=np.asarray(frame.covs),
        capacity=frame.capacity,
    )

    vmap = build_voxelmap(frame, 1.0)
    svmap = place_sharded(
        build_sharded_voxelmap(frame, 1.0, num_shards=8, capacity_per_shard=frame.capacity // 4),
        mesh,
    )

    ref_factor = make_vgicp_factor(0, 1, vmap, src, min_voxel_points=4)
    poses = jnp.stack([jnp.eye(4), jnp.eye(4)])
    lin_ref = ref_factor.linearize(poses)

    delta = jnp.eye(4)
    lin_sh = jax.jit(
        lambda sv, s, d: linearize_vgicp_sharded(sv, s, d, mesh, min_voxel_points=4.0)
    )(svmap, src, delta)

    np.testing.assert_allclose(np.asarray(lin_sh.num_inliers), np.asarray(lin_ref.num_inliers), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lin_sh.error), np.asarray(lin_ref.error), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lin_sh.H_tt), np.asarray(lin_ref.H_tt), rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(lin_sh.H_ss), np.asarray(lin_ref.H_ss), rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(lin_sh.b_t), np.asarray(lin_ref.b_t), rtol=2e-3, atol=2e-2)


def test_sharded_factor_optimizes_in_graph():
    mesh = _mesh()
    frame = _scene()
    xi = np.asarray([0.02, -0.01, 0.03, 0.2, -0.1, 0.15], dtype=np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    src = make_frame(
        np.asarray(se3.transform_points(se3.se3_inverse(T), frame.points)),
        covs=np.asarray(frame.covs),
        capacity=frame.capacity,
    )
    svmap = place_sharded(
        build_sharded_voxelmap(frame, 1.0, num_shards=8, capacity_per_shard=frame.capacity // 4),
        mesh,
    )
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(make_vgicp_sharded_factor(0, 1, svmap, src, mesh, min_voxel_points=4.0))
    poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=15)))(poses0)
    rot_e, trans_e = se3.pose_error(T, res.poses[1])
    assert float(rot_e) < 2e-3 and float(trans_e) < 2e-2


def test_sharded_insert_and_overlap():
    frame1 = _scene(seed=0)
    frame2 = _scene(seed=1)
    vmap = insert_frame(build_voxelmap(frame1, 1.0, capacity=2 * frame1.capacity), frame2)
    svmap = build_sharded_voxelmap(frame1, 1.0, num_shards=8, capacity_per_shard=frame1.capacity // 2)
    svmap, overflow = sharded_insert_frame(svmap, frame2)
    assert int(overflow) == 0
    assert int(sharded_num_voxels(svmap)) == int(vmap.num_voxels)

    T = jnp.eye(4)
    from gtsam_points_tpu.ops.voxelmap import voxelmap_overlap

    ov_rep = float(voxelmap_overlap(vmap, frame2, T))
    ov_sh = float(sharded_overlap(svmap, frame2, T))
    np.testing.assert_allclose(ov_sh, ov_rep, atol=1e-6)


def test_distributed_pose_graph_with_evm_ba():
    """Distributed refinement (SURVEY §5.8 / VERDICT r1 item 2): a graph mixing
    map-SHARDED VGICP factors (compute split across the 8-device mesh, one
    Linearized psum each) with EVM plane BA factors and a pose-graph prior
    optimizes jointly under optimize_lm with replicated pose state."""
    from gtsam_points_tpu.factors.balm import make_evm_factor

    mesh = _mesh()
    rng = np.random.RandomState(7)
    frame = _scene(seed=2)

    # two noisy poses observing the same scene; a shared plane feature
    xi1 = np.asarray([0.01, -0.02, 0.02, 0.15, -0.1, 0.1], dtype=np.float32)
    T1 = se3.se3_exp(jnp.asarray(xi1))
    src1 = make_frame(
        np.asarray(se3.transform_points(se3.se3_inverse(T1), frame.points)),
        covs=np.asarray(frame.covs),
        capacity=frame.capacity,
    )
    svmap = place_sharded(
        build_sharded_voxelmap(frame, 1.0, num_shards=8, capacity_per_shard=frame.capacity // 4),
        mesh,
    )

    # plane feature points seen from pose 0 (world) and pose 1 (local)
    plane_w = np.concatenate(
        [rng.rand(64, 2).astype(np.float32) * 4 - 2, np.full((64, 1), 10.0, np.float32)], axis=1
    )
    plane_1 = np.asarray(se3.transform_points(se3.se3_inverse(T1), jnp.asarray(plane_w)))
    evm = make_evm_factor("plane", {0: plane_w, 1: plane_1})

    from gtsam_points_tpu.factors import PriorFactor

    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(make_vgicp_sharded_factor(0, 1, svmap, src1, mesh, min_voxel_points=4.0))
    graph.add(evm)
    poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=15)))(poses0)
    rot_e, trans_e = se3.pose_error(T1, res.poses[1])
    assert float(rot_e) < 3e-3 and float(trans_e) < 3e-2, (float(rot_e), float(trans_e))


def test_sharded_linearize_2d_host_chip_mesh():
    """Multi-host layout on a virtual (2 hosts x 4 chips) mesh
    (parallel/sharding.make_mesh_2d): the shard axis splits over BOTH mesh
    axes and the Linearized psum becomes a hierarchical chip(ICI)-then-
    host(DCN) reduction. Result must match the replicated map."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from gtsam_points_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d(n_hosts=2, chips_per_host=4)
    frame = _scene()
    xi = np.asarray([0.02, -0.01, 0.03, 0.2, -0.1, 0.15], dtype=np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    src = make_frame(
        np.asarray(se3.transform_points(se3.se3_inverse(T), frame.points)),
        covs=np.asarray(frame.covs),
        capacity=frame.capacity,
    )
    vmap = build_voxelmap(frame, 1.0)
    axis = ("host", "chip")
    svmap = place_sharded(
        build_sharded_voxelmap(frame, 1.0, num_shards=8, capacity_per_shard=frame.capacity // 4),
        mesh,
        axis=axis,
    )
    ref_factor = make_vgicp_factor(0, 1, vmap, src, min_voxel_points=4)
    poses = jnp.stack([jnp.eye(4), jnp.eye(4)])
    lin_ref = ref_factor.linearize(poses)
    lin_sh = jax.jit(
        lambda sv, s, d: linearize_vgicp_sharded(sv, s, d, mesh, axis=axis, min_voxel_points=4.0)
    )(svmap, src, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(lin_sh.num_inliers), np.asarray(lin_ref.num_inliers), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lin_sh.error), np.asarray(lin_ref.error), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lin_sh.H_ss), np.asarray(lin_ref.H_ss), rtol=2e-3, atol=2e-2)

    # the sharded factor also optimizes on the 2D mesh
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(make_vgicp_sharded_factor(0, 1, svmap, src, mesh, axis=axis, min_voxel_points=4.0))
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=15)))(poses)
    rot_e, trans_e = se3.pose_error(T, res.poses[1])
    assert float(rot_e) < 2e-3 and float(trans_e) < 2e-2


def test_partition_frame_by_shard_weak_scaling():
    """The insert pre-partition (VERDICT r2 item 6) must (a) preserve every
    owned point exactly once, (b) give each shard a slice of size
    ~scan/num_shards (the weak-scaling property: per-device insert work
    shrinks as devices grow), and (c) count overflow instead of silently
    dropping."""
    from gtsam_points_tpu.parallel.sharded_voxelmap import (
        partition_frame_by_shard,
        shard_of_keys,
    )
    from gtsam_points_tpu.ops import voxel_keys as vk

    frame = _scene(seed=3)
    n_shards = 8
    parts, overflow = jax.jit(
        lambda f: partition_frame_by_shard(f, jnp.float32(1.0), n_shards)
    )(frame)
    # (b) per-shard capacity is ~N/num_shards (x slack), NOT N
    assert parts.points.shape[0] == n_shards
    assert parts.points.shape[1] <= frame.capacity // n_shards * 2 + 128
    assert int(overflow) == 0
    # (a) every valid point lands exactly once, in its owning shard
    assert int(jnp.sum(parts.mask)) == int(frame.num_valid())
    keys = vk.point_keys(frame.points, frame.mask, jnp.float32(1.0))
    own_counts = np.bincount(
        np.asarray(shard_of_keys(keys, n_shards))[np.asarray(frame.mask)],
        minlength=n_shards,
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(parts.mask, axis=1)), own_counts
    )
    # points in shard s really belong to shard s
    for s in range(n_shards):
        m = np.asarray(parts.mask[s])
        if not m.any():
            continue
        pk = vk.point_keys(parts.points[s], parts.mask[s], jnp.float32(1.0))
        sids = np.asarray(shard_of_keys(pk, n_shards))[m]
        assert (sids == s).all()
    # (c) tiny per-shard capacity must overflow, not crash
    _, ov2 = jax.jit(
        lambda f: partition_frame_by_shard(f, jnp.float32(1.0), n_shards, capacity_per_shard=8)
    )(frame)
    assert int(ov2) > 0
