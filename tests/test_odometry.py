"""Scan-to-map odometry pipeline over the kitti_07 submaps (reference analogue:
src/example/advanced_scan_matching.cpp — scan-to-iVox odometry). Each submap
registers against the incrementally-built voxel map; per-pose error vs the
bundled ground truth must stay within the reference bounds."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
from gtsam_points_tpu.pipelines.odometry import OdometryParams, init_odometry, odometry_step
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io, se3


def test_kitti07_scan_to_map_odometry(data_root):
    gt = io.load_graph(os.path.join(data_root, "kitti_07_dump/graph.txt"))
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))

    from gtsam_points_tpu.ops.features import estimate_normals_covs

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    frames = []
    for i in range(5):
        pts = io.read_points(os.path.join(data_root, f"kitti_07_dump/{i:06d}/points.bin"))
        frames.append(preprocess(make_frame(pts, capacity=25088)))

    params = OdometryParams(
        voxel_resolution=1.0,
        map_capacity=65536,
        min_voxel_points=4,
        max_iterations=15,
        keyframe_trans=0.1,
        keyframe_rot=0.05,
    )
    state = init_odometry(frames[0], params)
    est = [np.eye(4, dtype=np.float32)]
    rng = np.random.RandomState(42)
    for i, f in enumerate(frames[1:], start=1):
        # the submaps are up to ~12 m apart: supply a motion prediction (the
        # role an IMU / dense odometry plays), noised like the reference tests
        delta_gt = np.linalg.inv(T_gt[i - 1]) @ T_gt[i]
        # uniform(-0.1, 0.1) per tangent component = the reference's noise
        # distribution (test_matching_cost_factors.cpp:44); VGICP's single-voxel
        # lookup has a ~voxel-sized convergence basin, same as the reference
        noise = jnp.asarray(rng.uniform(-0.1, 0.1, 6).astype(np.float32))
        pred = jnp.asarray(delta_gt) @ se3.se3_exp(noise)
        state, T, diag = odometry_step(state, f, params, pred)
        est.append(np.asarray(T))

    # compare relative trajectory vs GT (gauge-aligned at pose 0)
    for i in range(1, 5):
        T_ref = np.linalg.inv(T_gt[0]) @ T_gt[i]
        rot_e, trans_e = se3.pose_error(jnp.asarray(T_ref), jnp.asarray(est[i]))
        assert float(rot_e) < 0.015, f"pose {i} rot {float(rot_e)}"
        assert float(trans_e) < 0.15, f"pose {i} trans {float(trans_e)}"


def test_donated_stepper_matches_undonated(data_root):
    """make_odometry_stepper(donate=True) must be numerically identical to
    the undonated step — donation only changes buffer reuse. Chained 3 steps
    (the streaming pattern the donated path exists for)."""
    import jax

    from gtsam_points_tpu.pipelines.odometry import (
        OdometryParams, init_odometry, make_odometry_stepper, odometry_step)

    from gtsam_points_tpu.ops.features import estimate_normals_covs

    prep = jax.jit(lambda f: estimate_normals_covs(
        voxelgrid_sampling(f, 0.5, capacity=8192), k=10, grid_leaf=1.0))
    target = prep(make_frame(io.read_points(
        os.path.join(data_root, "kitti_07_dump/000000/points.bin")), capacity=25088))
    source = prep(make_frame(io.read_points(
        os.path.join(data_root, "kitti_07_dump/000001/points.bin")), capacity=25088))
    params = OdometryParams(
        voxel_resolution=1.0, map_capacity=65536, min_voxel_points=4.0,
        max_iterations=5, keyframe_trans=1e-9, keyframe_rot=1e-9,
    )
    noise = se3.se3_exp(jnp.asarray([0.01, -0.01, 0.02, 0.05, -0.04, 0.03]))

    st_ref = init_odometry(target, params)
    poses_ref = []
    for _ in range(3):
        st_ref, T, _ = odometry_step(st_ref, source, params, noise)
        poses_ref.append(np.asarray(T))

    stepper = make_odometry_stepper(params, donate=True)
    st = jax.tree_util.tree_map(lambda x: x + 0, init_odometry(target, params))
    poses_don = []
    for _ in range(3):
        st, T, _ = stepper(st, source, noise)
        poses_don.append(np.asarray(T))

    for a, b in zip(poses_ref, poses_don):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_cluster_insert_odometry_matches_point_insert_trajectory(data_root):
    """Round 5: the cluster-moment insert path (clusters= kwarg) must produce
    the same trajectory as the per-point insert within registration noise —
    the map it builds differs only by which voxel a border-straddling
    cluster's mass lands in."""
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.registration import cluster_source

    prep = jax.jit(lambda f: estimate_normals_covs(
        voxelgrid_sampling(f, 0.5, capacity=8192), k=10, grid_leaf=1.0))
    target = prep(make_frame(io.read_points(
        os.path.join(data_root, "kitti_07_dump/000000/points.bin")), capacity=25088))
    source = prep(make_frame(io.read_points(
        os.path.join(data_root, "kitti_07_dump/000001/points.bin")), capacity=25088))
    params = OdometryParams(
        voxel_resolution=1.0, map_capacity=65536, min_voxel_points=4.0,
        max_iterations=8, keyframe_trans=1e-9, keyframe_rot=1e-9,
    )
    g = io.load_graph(os.path.join(data_root, "kitti_07_dump/graph.txt"))
    T_rel = se3.se3_inverse(se3.pose_from_xyzq(jnp.asarray(g[0]))) @ se3.pose_from_xyzq(
        jnp.asarray(g[1])
    )
    noise = se3.se3_exp(jnp.asarray([0.01, -0.01, 0.02, 0.05, -0.04, 0.03]))
    clusters = jax.jit(lambda s: cluster_source(s, 1.0, 4096))(source)

    st_pt = init_odometry(target, params)
    st_cl = init_odometry(target, params)
    for step in range(3):
        # proper motion prediction (the odometry contract): first step moves
        # to the true relative pose + noise; later steps re-register the
        # same frame, so the prediction is the residual noise only
        pred = (T_rel @ noise) if step == 0 else noise
        st_pt, T_pt, _ = odometry_step(st_pt, source, params, pred)
        st_cl, T_cl, diag = odometry_step(st_cl, source, params, pred, clusters)
        assert not bool(diag["full_merge"])  # cluster insert did not overflow
        for T in (T_pt, T_cl):  # both paths at the true pose
            rot_g, trans_g = se3.pose_error(jnp.asarray(T), T_rel)
            assert float(rot_g) < 0.015 and float(trans_g) < 0.15, (
                step, float(rot_g), float(trans_g))
        rot_e, trans_e = se3.pose_error(jnp.asarray(T_pt), jnp.asarray(T_cl))
        assert float(rot_e) < 0.01 and float(trans_e) < 0.05, (
            float(rot_e), float(trans_e))
    # both maps carry the same total mass (mask-equal insert volume)
    np.testing.assert_allclose(
        float(jnp.sum(st_cl.vmap.moments[:, 0])),
        float(jnp.sum(st_pt.vmap.moments[:, 0])),
        rtol=1e-5,
    )
