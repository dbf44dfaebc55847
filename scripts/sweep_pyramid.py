"""On-device sweep of pyramid schedules: worst-case accuracy over many seeds
x B=64 lanes + steady-state throughput (marginal protocol). Run on the real
TPU; picks DEFAULT_STAGES evidence. Usage: python scripts/sweep_pyramid.py"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import gtsam_points_tpu  # noqa
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.registration.pyramid import (
    PyramidStage, build_pyramid, register_scan_pyramid)
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io, se3
from gtsam_points_tpu.utils.benchtime import chain_marginal

cap = 25088
data = io.data_root()
pts0 = io.read_points(os.path.join(data, "kitti_07_dump/000000/points.bin"))
pts1 = io.read_points(os.path.join(data, "kitti_07_dump/000001/points.bin"))
g = io.load_graph(os.path.join(data, "kitti_07_dump/graph.txt"))
T_rel = se3.se3_inverse(se3.pose_from_xyzq(jnp.asarray(g[0]))) @ se3.pose_from_xyzq(jnp.asarray(g[1]))
prep = jax.jit(lambda f: estimate_normals_covs(f, k=10, grid_leaf=1.0))
target = prep(make_frame(pts0, capacity=cap))
source = prep(make_frame(pts1, capacity=cap))
B = 64

# Round-4 final candidates. Findings encoded here (full grids in the git
# history of scripts/sweep_pyramid*.py): stage-frozen correspondence CACHING
# is rejected (worst lane 0.8 m vs 0.008 m — GN converges to the frozen
# objective's offset optimum), source STRIDING is free at coarse/mid stages,
# and the stride ladder 8 -> 4 -> 2 -> 1 (DEFAULT_STAGES) holds 0.019 m
# worst-lane over 24 seeds at ~2.3x the throughput of the full-resolution
# QUALITY_STAGES (0.008 m).
from gtsam_points_tpu.registration.pyramid import DEFAULT_STAGES, QUALITY_STAGES

SCHEDULES = {
    "default_stride_ladder": list(DEFAULT_STAGES),
    "quality": list(QUALITY_STAGES),
    "r3_full_res_2_1_4": [PyramidStage(4.0, 2, 1, 2), PyramidStage(2.0, 1, 1, 1), PyramidStage(1.0, 4, 1, 4)],
    "cached_for_reference": [PyramidStage(4.0, 2, 4, 1), PyramidStage(2.0, 1, 2, 1), PyramidStage(1.0, 4, 1, 1)],
}

for name, stages in SCHEDULES.items():
    stages = tuple(stages)
    maps = jax.jit(lambda f: build_pyramid(f, stages))(target)
    reg = jax.jit(jax.vmap(lambda T0: register_scan_pyramid(maps, source, T0, stages)))

    worst_rot, worst_trans = 0.0, 0.0
    for seed in range(24):
        rng = np.random.RandomState(seed)
        xis = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)).astype(np.float32))
        T0s = jax.vmap(lambda xi: T_rel @ se3.se3_exp(xi))(xis)
        Ts = reg(T0s)
        rot_e, trans_e = jax.vmap(lambda T: se3.pose_error(T, T_rel))(Ts)
        worst_rot = max(worst_rot, float(jnp.max(rot_e)))
        worst_trans = max(worst_trans, float(jnp.max(trans_e)))

    rng = np.random.RandomState(0)
    xis = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)).astype(np.float32))
    T0s = jax.vmap(lambda xi: T_rel @ se3.se3_exp(xi))(xis)

    def reg_chain(K):
        cur = T0s
        for _ in range(K):
            T_in = T0s.at[:, :3, 3].add(1e-12 * cur[:, :3, 3])
            cur = reg(T_in)
        jax.block_until_ready(cur)

    marginal_s, _ = chain_marginal(reg_chain, 2, 6, trials=3)
    fps = B / marginal_s
    print(f"{name:28s} fps={fps:8.1f} worst_rot={worst_rot:.5f} worst_trans={worst_trans:.5f}")
