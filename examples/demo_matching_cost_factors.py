"""All matching-cost factor x optimizer combinations on the kitti_07 submaps
(reference: src/demo/demo_matching_cost_factors.cpp:197-260 — there an
interactive viewer; here a results table).

Builds the 5-pose sequential graph, perturbs GT with uniform noise (the
reference protocol), and optimizes with every factor family x {LM, GN,
Dogleg, ISAM2-incremental}; prints per-combo pose error vs GT and wall time.

Run: python examples/demo_matching_cost_factors.py [--platform cpu]
"""

import time

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gtsam_points_tpu.factors import (
        PriorFactor,
        make_gicp_factor,
        make_icp_factor,
        make_vgicp_factor,
    )
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.dogleg import optimize_dogleg
    from gtsam_points_tpu.optim.isam2 import ISAM2Ext
    from gtsam_points_tpu.optim.lm import LMParams, optimize_gn
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    N = 5
    gt = io.load_graph(f"{DATA}/kitti_07_dump/graph.txt")
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))[:N]

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    frames = [
        preprocess(make_frame(io.read_points(f"{DATA}/kitti_07_dump/{i:06d}/points.bin"), capacity=25088))
        for i in range(N)
    ]

    def make(kind, i, j):
        if kind == "ICP":
            return make_icp_factor(i, j, frames[i], frames[j], max_corr_dist=2.0)
        if kind == "P2P-ICP":
            return make_icp_factor(i, j, frames[i], frames[j], point_to_plane=True, max_corr_dist=2.0)
        if kind == "GICP":
            return make_gicp_factor(i, j, frames[i], frames[j], max_corr_dist=2.0)
        return make_vgicp_factor(i, j, frames[i], frames[j], voxel_resolution=1.0, min_voxel_points=4)

    def noised(sigma=0.1, seed=42):
        # uniform(-sigma, sigma) per tangent dim — the reference protocol
        # (test_matching_cost_factors.cpp:42-60)
        rng = np.random.RandomState(seed)
        out = [T_gt[0]]
        for i in range(1, N):
            xi = jnp.asarray(rng.uniform(-sigma, sigma, 6).astype(np.float32))
            out.append(np.asarray(jnp.asarray(T_gt[i]) @ se3.se3_exp(xi)))
        return jnp.asarray(np.stack(out))

    def max_errors(poses):
        rot_m, trans_m = 0.0, 0.0
        for i in range(N):
            T_est = np.linalg.inv(np.asarray(poses[0])) @ np.asarray(poses[i])
            T_ref = np.linalg.inv(T_gt[0]) @ T_gt[i]
            r, t = se3.pose_error(jnp.asarray(T_ref), jnp.asarray(T_est))
            rot_m, trans_m = max(rot_m, float(r)), max(trans_m, float(t))
        return rot_m, trans_m

    pairs = [(i, i + 1) for i in range(N - 1)]  # sequential chain (reference protocol)
    print(f"{'factor':>8} {'optimizer':>10} {'rot_err':>9} {'trans_err':>10} {'time_s':>8}")
    for kind in ("ICP", "P2P-ICP", "GICP", "VGICP"):
        graph = FactorGraph(num_poses=N)
        graph.add(PriorFactor(prior=jnp.asarray(T_gt[0]), weights=jnp.full((6,), 1e6), key=0))
        for i, j in pairs:
            graph.add(make(kind, i, j))

        # point-to-point ICP converges linearly — give it the reference LM
        # default budget (maxIterations=100); the distribution-based costs
        # converge in well under 20
        iters = 100 if kind == "ICP" else 20
        for opt in ("LM", "GN", "Dogleg", "ISAM2"):
            t0 = time.perf_counter()
            if opt == "LM":
                poses = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=iters)))(noised()).poses
            elif opt == "GN":
                poses = jax.jit(lambda p: optimize_gn(graph, p, iterations=iters))(noised()).poses
            elif opt == "Dogleg":
                from gtsam_points_tpu.optim.dogleg import DoglegParams

                poses = jax.jit(
                    lambda p: optimize_dogleg(graph, p, DoglegParams(max_iterations=iters))
                )(noised()).poses
            else:  # incremental insertion
                isam = ISAM2Ext(max_poses=N, lm_params=LMParams(max_iterations=iters))
                init = noised()
                isam.update([PriorFactor(prior=jnp.asarray(T_gt[0]), weights=jnp.full((6,), 1e6), key=0)], {0: init[0]})
                for i in range(1, N):
                    fs = [make(kind, j, i) for j in range(i) if (j, i) in pairs]
                    isam.update(fs, {i: init[i]})
                poses = isam.calculate_estimate()[:N]
            jax.block_until_ready(poses)
            dt = time.perf_counter() - t0
            r, t = max_errors(poses)
            flag = "" if (r < 0.015 and t < 0.15) else "  <-- outside reference bounds"
            print(f"{kind:>8} {opt:>10} {r:9.4f} {t:10.4f} {dt:8.2f}{flag}")


if __name__ == "__main__":
    main()
