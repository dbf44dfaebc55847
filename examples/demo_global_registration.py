"""Global registration without an initial guess (reference:
src/demo/demo_global_registration.cpp): FPFH features + batched-hypothesis
RANSAC and graduated non-convexity on the kitti_00 pair, then GICP refine.

Run: python examples/demo_global_registration.py [--platform cpu]
"""

import time

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gtsam_points_tpu.factors import make_gicp_factor
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.registration import (
        GNCParams,
        RANSACParams,
        estimate_fpfh,
        estimate_pose_gnc,
        estimate_pose_ransac,
    )
    from gtsam_points_tpu.types.frame import make_frame, transform_frame
    from gtsam_points_tpu.utils import io, se3

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    target = preprocess(make_frame(io.read_points(f"{DATA}/kitti_00/000000.bin"), capacity=131072))
    source = preprocess(make_frame(io.read_points(f"{DATA}/kitti_00/000001.bin"), capacity=131072))

    # fine-align the pair first so the ground truth is exact (the reference
    # test does the same, test_global_registration.cpp), then apply a large
    # known offset: 90 deg yaw + 20 m — no initial guess given to the estimators
    pre = FactorGraph(num_poses=1)
    pre.add(make_gicp_factor(-1, 0, target, source, max_corr_dist=2.0))
    pre_res = jax.jit(lambda p: optimize_lm(pre, p, LMParams(max_iterations=15)))(jnp.eye(4)[None])
    source = transform_frame(pre_res.poses[0], source)
    axis = jnp.asarray([0.0, 0.0, 1.0])
    T_true = se3.make_transform(se3.so3_exp(axis * (jnp.pi / 2)), jnp.asarray([20.0, 5.0, 1.0]))
    source = transform_frame(se3.se3_inverse(T_true), source)

    t0 = time.perf_counter()
    f_t = estimate_fpfh(target)
    f_s = estimate_fpfh(source)
    jax.block_until_ready(f_s)
    print(f"FPFH features: {time.perf_counter() - t0:.2f} s")

    for name, run in (
        ("RANSAC", lambda: estimate_pose_ransac(target, source, f_t, f_s, RANSACParams(max_iterations=8192))),
        ("GNC", lambda: estimate_pose_gnc(target, source, f_t, f_s, GNCParams())),
    ):
        t0 = time.perf_counter()
        res = jax.jit(run)()
        jax.block_until_ready(res.T_target_source)
        dt = time.perf_counter() - t0
        rot_e, trans_e = se3.pose_error(T_true, res.T_target_source)

        # GICP refinement from the coarse pose
        refined_src = transform_frame(res.T_target_source, source)
        graph = FactorGraph(num_poses=1)
        graph.add(make_gicp_factor(-1, 0, target, refined_src, max_corr_dist=2.0))
        ref = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=15)))(jnp.eye(4)[None])
        T_fine = ref.poses[0] @ res.T_target_source
        rot_f, trans_f = se3.pose_error(T_true, T_fine)
        print(
            f"{name:>7}: coarse rot {float(rot_e):.4f} rad / trans {float(trans_e):.3f} m "
            f"({dt:.2f} s, inliers {float(res.inlier_rate):.2f}) -> refined rot {float(rot_f):.4f} / trans {float(trans_f):.4f}"
        )


if __name__ == "__main__":
    main()
