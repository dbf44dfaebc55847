"""End-to-end SLAM on the bundled kitti_07 submaps: scan-to-map VGICP odometry
+ FPFH/GNC loop-closure detection + batched pose-graph refinement.

This is the machinery of BASELINE.json config 5 exercised on the bundled data
(reference analogues: src/example/advanced_scan_matching.cpp odometry,
src/demo/demo_matching_cost_factors.cpp multi-frame graph).

Run: python examples/kitti07_slam.py [--platform cpu]
"""

import argparse
import os
import sys
import time

# repo root, independent of the caller's cwd (the example CI runs from examples/)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="cpu to force local CPU")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import jax.numpy as jnp

    import gtsam_points_tpu
    from gtsam_points_tpu.factors import BetweenFactor, PriorFactor, make_gicp_factor
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.pipelines.odometry import OdometryParams, init_odometry, odometry_step
    from gtsam_points_tpu.registration import GNCParams, estimate_fpfh, estimate_pose_gnc
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3
    from gtsam_points_tpu.utils.profiling import EasyProfiler

    gt = io.load_graph("/root/reference/data/kitti_07_dump/graph.txt")
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))

    with EasyProfiler("kitti07_slam") as prof:
        @jax.jit
        def preprocess(f):
            f = voxelgrid_sampling(f, 0.5, capacity=16384)
            return estimate_normals_covs(f, k=10, grid_leaf=1.0)

        frames = []
        for i in range(5):
            pts = io.read_points(f"/root/reference/data/kitti_07_dump/{i:06d}/points.bin")
            frames.append(preprocess(make_frame(pts, capacity=25088)))
        jax.block_until_ready(frames[-1].points)
        prof.push("preprocess (5 scans)")

        # --- odometry (scan-to-map VGICP) ---
        params = OdometryParams(
            voxel_resolution=1.0, map_capacity=131072, min_voxel_points=4.0,
            max_iterations=20, keyframe_trans=0.1, keyframe_rot=0.05,
        )
        state = init_odometry(frames[0], params)
        odom = [np.eye(4, dtype=np.float32)]
        rng = np.random.RandomState(42)
        for i, f in enumerate(frames[1:], start=1):
            delta_gt = np.linalg.inv(T_gt[i - 1]) @ T_gt[i]
            noise = jnp.asarray(rng.uniform(-0.1, 0.1, 6).astype(np.float32))
            pred = jnp.asarray(delta_gt) @ se3.se3_exp(noise)
            state, T, diag = odometry_step(state, f, params, pred)
            odom.append(np.asarray(T))
        jax.block_until_ready(state.vmap.keys)
        prof.push("odometry (4 steps)")

        # --- loop closure candidate: frame 4 vs frame 0 via global registration ---
        f_t = estimate_fpfh(frames[0])
        f_s = estimate_fpfh(frames[4])
        lc = jax.jit(lambda: estimate_pose_gnc(frames[0], frames[4], f_t, f_s, GNCParams()))()
        jax.block_until_ready(lc.T_target_source)
        prof.push("loop closure (GNC)")

        # --- pose graph: odometry betweens + loop closure between, refined by GICP factors ---
        graph = FactorGraph(num_poses=5)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
        for i in range(4):
            graph.add(make_gicp_factor(i, i + 1, frames[i], frames[i + 1], max_corr_dist=2.0, grid_leaf=1.0))
        graph.add(make_gicp_factor(0, 4, frames[0], frames[4], max_corr_dist=2.0, grid_leaf=1.0))
        poses0 = jnp.asarray(np.stack(odom))
        res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=20)))(poses0)
        jax.block_until_ready(res.poses)
        prof.push("pose graph (5 GICP factors)")

    # --- report ---
    print("\npose errors vs ground truth (gauge-aligned):")
    worst_rot, worst_trans = 0.0, 0.0
    for i in range(5):
        T_ref = np.linalg.inv(T_gt[0]) @ T_gt[i]
        T_est = np.linalg.inv(np.asarray(res.poses[0])) @ np.asarray(res.poses[i])
        r, t = se3.pose_error(jnp.asarray(T_ref), jnp.asarray(T_est))
        worst_rot, worst_trans = max(worst_rot, float(r)), max(worst_trans, float(t))
        print(f"  pose {i}: rot {float(r):.5f} rad, trans {float(t):.5f} m")
    print(f"loop closure inlier rate: {float(lc.inlier_rate):.3f}")
    ok = worst_rot < 0.015 and worst_trans < 0.15
    print(f"bounds rot<0.015 trans<0.15: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
