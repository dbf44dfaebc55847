"""Distributed layer tests on the 8-device virtual CPU mesh: sharded batched
linearization must match the unsharded result, and the sharded LM must hit the
same accuracy (the reference has no distributed layer — this is the new
capability; the test pattern mirrors holding GPU factors to CPU bounds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import PriorFactor
from gtsam_points_tpu.factors.batch import make_vgicp_factor_batch
from gtsam_points_tpu.ops.voxelmap import build_voxelmap
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.parallel import make_mesh, replicate, shard_frame
from gtsam_points_tpu.parallel.distributed import optimize_lm_sharded, shard_factor_batch
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3


def box_cloud(n, seed):
    rng = np.random.RandomState(seed)
    pts = []
    for ax in range(3):
        p = rng.rand(n // 3, 3) * 10 - 5
        p[:, ax] = np.sign(p[:, ax]) * 5 + rng.randn(n // 3) * 0.02
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


@pytest.fixture(scope="module")
def batch_problem():
    """8 unary VGICP factors (one pose each) with known GT offsets."""
    rng = np.random.RandomState(0)
    pts = box_cloud(1536, 0)
    target = make_frame(pts, capacity=1536)
    vmap = build_voxelmap(target, leaf=1.0, capacity=2048)
    vmaps, sources, t_keys, s_keys, gts = [], [], [], [], []
    for i in range(8):
        xi = jnp.asarray(rng.randn(6).astype(np.float32) * 0.05)
        T = se3.se3_exp(xi)
        src = np.asarray(se3.transform_points(se3.se3_inverse(T), jnp.asarray(pts)))
        vmaps.append(vmap)
        sources.append(make_frame(src, capacity=1536))
        t_keys.append(-1)
        s_keys.append(i)
        gts.append(T)
    batch = make_vgicp_factor_batch(vmaps, sources, t_keys, s_keys, min_voxel_points=3.0)
    return batch, jnp.stack(gts)


def test_batch_matches_individual(batch_problem):
    """Batched linearize-all equals per-factor linearization."""
    from gtsam_points_tpu.factors.vgicp import VGICPFactor

    batch, gts = batch_problem
    poses = jnp.tile(jnp.eye(4)[None], (8, 1, 1))
    graph_b = FactorGraph(num_poses=8)
    graph_b.add(batch)
    A_b, b_b, err_b = jax.jit(graph_b.linearize_full)(poses)

    graph_i = FactorGraph(num_poses=8)
    for i in range(8):
        graph_i.add(
            VGICPFactor(
                voxelmap=jax.tree_util.tree_map(lambda x: x[i], batch.voxelmaps),
                source=jax.tree_util.tree_map(lambda x: x[i], batch.sources),
                fixed_target_pose=jnp.eye(4),
                target_key=-1,
                source_key=i,
                min_voxel_points=3.0,
            )
        )
    A_i, b_i, err_i = jax.jit(graph_i.linearize_full)(poses)
    np.testing.assert_allclose(np.asarray(A_b), np.asarray(A_i), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(b_b), np.asarray(b_i), rtol=1e-4, atol=1e-1)
    np.testing.assert_allclose(float(err_b), float(err_i), rtol=1e-5)


def test_sharded_lm_matches_unsharded(batch_problem):
    """Factor-axis sharding over 8 devices gives the same optimization result
    as single-device execution (the reference holds GPU factors to the same
    bounds as CPU the same way), and stays within the scene's VGICP accuracy."""
    batch, gts = batch_problem
    poses0 = jnp.tile(jnp.eye(4)[None], (8, 1, 1))

    graph_u = FactorGraph(num_poses=8)
    graph_u.add(batch)
    res_u = jax.jit(lambda p: optimize_lm(graph_u, p, LMParams(max_iterations=10)))(poses0)

    mesh = make_mesh(8, axis="factor")
    sharded = shard_factor_batch(batch, mesh, "factor")
    graph_s = FactorGraph(num_poses=8)
    graph_s.add(sharded)
    res_s = optimize_lm_sharded(graph_s, poses0, mesh, LMParams(max_iterations=10))

    rot_d, trans_d = se3.pose_error(res_u.poses, res_s.poses)
    assert float(jnp.max(rot_d)) < 1e-4, float(jnp.max(rot_d))
    assert float(jnp.max(trans_d)) < 1e-3, float(jnp.max(trans_d))

    # and both are within the coarse-voxel scene accuracy vs GT
    rot_e, trans_e = se3.pose_error(gts, res_s.poses)
    assert float(jnp.max(rot_e)) < 5e-2
    assert float(jnp.max(trans_e)) < 1e-1
