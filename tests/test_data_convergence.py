"""Ground-truth convergence on the bundled real datasets — the reference's
dominant test pattern (src/test/test_matching_cost_factors.cpp:227-228): load
scans + GT poses, perturb with fixed-seed noise (sigma=0.1), build a graph
(prior + sequential factors), optimize, assert per-pose error after
optimization: rot < 0.015 rad, trans < 0.15 m."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import PriorFactor, make_gicp_factor, make_vgicp_factor
from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io, se3

ROT_TOL = 0.015
TRANS_TOL = 0.15
NUM_POSES = 3  # subset of the 5 submaps to keep CPU test time bounded


@pytest.fixture(scope="module")
def kitti07(data_root):
    gt = io.load_graph(os.path.join(data_root, "kitti_07_dump/graph.txt"))
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))[:NUM_POSES]

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    frames = []
    for i in range(NUM_POSES):
        pts = io.read_points(os.path.join(data_root, f"kitti_07_dump/{i:06d}/points.bin"))
        frames.append(preprocess(make_frame(pts, capacity=25088)))
    return frames, T_gt


def noised_poses(T_gt, sigma=0.1, seed=42):
    rng = np.random.RandomState(seed)
    out = [T_gt[0]]
    for i in range(1, len(T_gt)):
        xi = jnp.asarray(rng.randn(6).astype(np.float32) * sigma)
        out.append(np.asarray(jnp.asarray(T_gt[i]) @ se3.se3_exp(xi)))
    return jnp.asarray(np.stack(out))


def check_errors(poses, T_gt):
    for i in range(len(T_gt)):
        # gauge-align to pose 0 before comparing (reference aligns the same way)
        T_est = np.linalg.inv(np.asarray(poses[0])) @ np.asarray(poses[i])
        T_ref = np.linalg.inv(T_gt[0]) @ T_gt[i]
        rot_e, trans_e = se3.pose_error(jnp.asarray(T_ref), jnp.asarray(T_est))
        assert float(rot_e) < ROT_TOL, f"pose {i}: rot {float(rot_e)}"
        assert float(trans_e) < TRANS_TOL, f"pose {i}: trans {float(trans_e)}"


def test_kitti07_gicp_graph(kitti07):
    frames, T_gt = kitti07
    graph = FactorGraph(num_poses=NUM_POSES)
    graph.add(PriorFactor(prior=jnp.asarray(T_gt[0]), weights=jnp.full((6,), 1e6), key=0))
    for i in range(NUM_POSES - 1):
        graph.add(make_gicp_factor(i, i + 1, frames[i], frames[i + 1], max_corr_dist=2.0, grid_leaf=1.0))
    poses0 = noised_poses(T_gt)
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=20)))(poses0)
    check_errors(res.poses, T_gt)


def test_kitti07_vgicp_graph(kitti07):
    frames, T_gt = kitti07
    graph = FactorGraph(num_poses=NUM_POSES)
    graph.add(PriorFactor(prior=jnp.asarray(T_gt[0]), weights=jnp.full((6,), 1e6), key=0))
    for i in range(NUM_POSES - 1):
        graph.add(make_vgicp_factor(i, i + 1, frames[i], frames[i + 1], voxel_resolution=1.0, min_voxel_points=4))
    poses0 = noised_poses(T_gt)
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=20)))(poses0)
    check_errors(res.poses, T_gt)


def test_kitti07_gicp_graph_moments_covs(kitti07):
    """Same protocol with the fast moments-based covariance estimation
    (ops/features.py:estimate_normals_covs_moments) — must meet the same
    reference bounds."""
    from gtsam_points_tpu.ops.features import estimate_normals_covs_moments

    frames_knn, T_gt = kitti07

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs_moments(f, leaf=1.0)

    frames = []
    for i in range(NUM_POSES):
        pts = io.read_points(
            os.path.join(os.environ.get("GTSAM_POINTS_DATA", "/root/reference/data"),
                         f"kitti_07_dump/{i:06d}/points.bin"))
        frames.append(preprocess(make_frame(pts, capacity=25088)))

    graph = FactorGraph(num_poses=NUM_POSES)
    graph.add(PriorFactor(prior=jnp.asarray(T_gt[0]), weights=jnp.full((6,), 1e6), key=0))
    for i in range(NUM_POSES - 1):
        graph.add(make_gicp_factor(i, i + 1, frames[i], frames[i + 1], max_corr_dist=2.0, grid_leaf=1.0))
    poses0 = noised_poses(T_gt)
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=20)))(poses0)
    check_errors(res.poses, T_gt)
