"""CT-ICP on the real newer_06 scans — the reference protocol
(src/test/test_continuous_time.cpp:14-135): target = deskewed cloud with
covs/normals, source = raw cloud with per-point times, optimize the 2-pose
(scan begin/end) CT factor from identity init, then the deskewed source must
lie within RMSE < 0.1 m of the target."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import PriorFactor, make_ct_icp_factor
from gtsam_points_tpu.factors.ct_icp import deskew
from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.ops.hash_grid import brute_force_knn
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io

SCANS = (0, 1)  # of 3 (CPU test-time bound)


@pytest.fixture(scope="module")
def newer06(data_root):
    out = []
    for i in SCANS:
        times = io.read_times(os.path.join(data_root, f"newer_06/times_{i:02d}.bin"))
        raw = io.read_points(os.path.join(data_root, f"newer_06/raw_{i:02d}.bin"))
        desk = io.read_points(os.path.join(data_root, f"newer_06/deskewed_{i:02d}.bin"))
        assert len(times) == len(raw) == len(desk) > 0
        # the reference rotates raw points by quat (w=0,x=0,y=0,z=1) = 180 deg
        # about z before use (test_continuous_time.cpp:31-34)
        raw = raw * np.array([-1.0, -1.0, 1.0], dtype=np.float32)
        source = make_frame(raw, times=times, capacity=65536)
        source = estimate_normals_covs(source, k=20, grid_leaf=0.5)
        target = make_frame(desk, capacity=65536)
        target = estimate_normals_covs(target, k=20, grid_leaf=0.5)
        out.append((source, target))
    return out


def _rmse_to_target(frame, target):
    _, sq, valid = brute_force_knn(
        target.points, target.mask, frame.points, frame.mask, k=1, block=4096
    )
    sq = jnp.where(valid[:, 0] & frame.mask, sq[:, 0], 0.0)
    n = jnp.sum((valid[:, 0] & frame.mask).astype(jnp.float32))
    return float(jnp.sqrt(jnp.sum(sq) / jnp.maximum(n, 1.0)))


@pytest.mark.parametrize("gicp", [False, True], ids=["CTICP", "CTGICP"])
def test_ct_alignment(newer06, gicp):
    for source, target in newer06:
        factor = make_ct_icp_factor(
            0, 1, target, source, gicp=gicp, max_corr_dist=1.0 if gicp else 2.0
        )
        graph = FactorGraph(num_poses=2)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e3), key=0))
        graph.add(factor)
        poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
        res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=30)))(poses0)
        corrected = deskew(res.poses[0], res.poses[1], factor.source)
        rmse = _rmse_to_target(corrected, target)
        assert rmse < 0.1, f"scan: deskewed RMSE {rmse}"
