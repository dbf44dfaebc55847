"""LOAM factor convergence on the real newer_01 edge/plane clouds — the
reference's test protocol (src/test/test_loam_factors.cpp:20-180): load 5
frames of pre-extracted edge/plane points + GT poses from graph.txt,
randomgrid-sample planes to ~5000 pts, optimize pairwise graphs from identity
init, assert after gauge alignment rot < 0.015 rad / trans < 0.15 m."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import PriorFactor, make_loam_factor
from gtsam_points_tpu.factors.loam import PointToEdgeFactor, PointToPlaneLOAMFactor
from gtsam_points_tpu.ops.downsample import randomgrid_sampling
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io, se3

ROT_TOL = 0.015
TRANS_TOL = 0.15
NUM_FRAMES = 3  # of 5 (CPU test-time bound; pairs 0-1 and 1-2 both covered)


@pytest.fixture(scope="module")
def newer01(data_root):
    gt = io.load_graph(os.path.join(data_root, "newer_01/graph.txt"))
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))[:NUM_FRAMES]
    edges, planes = [], []
    key = jax.random.PRNGKey(0)
    for i in range(NUM_FRAMES):
        e = io.read_points(os.path.join(data_root, f"newer_01/edges_{i * 10:06d}.bin"))
        p = io.read_points(os.path.join(data_root, f"newer_01/planes_{i * 10:06d}.bin"))
        ef = make_frame(e, capacity=4096)
        pf = make_frame(p, capacity=65536)
        key, sub = jax.random.split(key)
        rate = min(1.0, 5000.0 / len(p))
        pf = jax.jit(lambda f, k: randomgrid_sampling(f, 1.0, rate, k, capacity=8192))(pf, sub)
        edges.append(ef)
        planes.append(pf)
    return edges, planes, T_gt


def _check(poses, T_gt):
    delta = T_gt[0] @ np.linalg.inv(np.asarray(poses[0]))
    for i in range(1, len(T_gt)):
        T_err = np.linalg.inv(T_gt[i]) @ (delta @ np.asarray(poses[i]))
        xi = np.asarray(se3.se3_log(jnp.asarray(T_err)))
        assert np.linalg.norm(xi[:3]) < ROT_TOL, f"pose {i}: rot {np.linalg.norm(xi[:3])}"
        assert np.linalg.norm(xi[3:]) < TRANS_TOL, f"pose {i}: trans {np.linalg.norm(xi[3:])}"


def _pair_graph(factor, poses0):
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.asarray(poses0[0]), weights=jnp.full((6,), 1e6), key=0))
    graph.add(factor)
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=30)))(jnp.asarray(poses0))
    return res.poses


def test_loam_pair(newer01):
    """Combined edge+plane LOAM on pair (0,1) from identity init."""
    edges, planes, T_gt = newer01
    f = make_loam_factor(
        0, 1,
        target_edges=edges[0], target_planes=planes[0],
        source_edges=edges[1], source_planes=planes[1],
        max_corr_dist=2.0, grid_leaf=2.0, max_points_per_cell=32,
    )
    poses = _pair_graph(f, np.stack([np.eye(4, dtype=np.float32)] * 2))
    _check(poses, T_gt[:2])


def test_plane_only_pair(newer01):
    from gtsam_points_tpu.ops.hash_grid import build_hash_grid

    edges, planes, T_gt = newer01
    f = PointToPlaneLOAMFactor(
        target=planes[0],
        source=planes[1],
        grid=build_hash_grid(planes[0].points, planes[0].mask, 2.0, max_points_per_cell=32),
        fixed_target_pose=jnp.eye(4),
        target_key=0,
        source_key=1,
        max_corr_dist=2.0,
        num_neighbor_cells=27,
        max_points_per_cell=32,
    )
    poses = _pair_graph(f, np.stack([np.eye(4, dtype=np.float32)] * 2))
    _check(poses, T_gt[:2])


def test_loam_chain(newer01):
    """Sequential chain over all loaded frames, identity init (reference's
    multi-frame AlignmentTest tail, test_loam_factors.cpp:181+)."""
    edges, planes, T_gt = newer01
    graph = FactorGraph(num_poses=NUM_FRAMES)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    for i in range(NUM_FRAMES - 1):
        graph.add(
            make_loam_factor(
                i, i + 1,
                target_edges=edges[i], target_planes=planes[i],
                source_edges=edges[i + 1], source_planes=planes[i + 1],
                max_corr_dist=2.0, grid_leaf=2.0, max_points_per_cell=32,
            )
        )
    poses0 = jnp.stack([jnp.eye(4)] * NUM_FRAMES)
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=30)))(poses0)
    _check(res.poses, T_gt)
