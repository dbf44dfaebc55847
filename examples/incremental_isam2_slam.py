"""Incremental SLAM with ISAM2Ext: kitti_07 submaps streamed pose-by-pose.

Demonstrates the bounded-window incremental optimizer (optim/isam2.py): each
update adds one pose + its VGICP factor, poses falling out of the window are
Schur-marginalized into a dense prior and frozen, and — the TPU-side
contract — once the window structure reaches steady state, updates reuse ONE
compiled XLA program (watch the `compile` flag disappear from the telemetry).

Reference analogue: ISAM2Ext incremental insertion
(src/gtsam_points/optimizers/isam2_ext.cpp:425-520); the reference bounds
per-update work with a Bayes tree, this framework with a sliding window.

Run: python examples/incremental_isam2_slam.py [--platform cpu]
"""

import os

import numpy as np

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp

    from gtsam_points_tpu.factors import PriorFactor, make_vgicp_factor
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.optim.isam2 import ISAM2Ext
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    gt = io.load_graph(os.path.join(DATA, "kitti_07_dump/graph.txt"))
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    frames = []
    for i in range(5):
        pts = io.read_points(os.path.join(DATA, f"kitti_07_dump/{i:06d}/points.bin"))
        frames.append(preprocess(make_frame(pts, capacity=25088)))

    rng = np.random.RandomState(42)
    isam = ISAM2Ext(window_size=3, lm_params=LMParams(max_iterations=30))
    init0 = T_gt[0]
    res = isam.update(
        [PriorFactor(prior=jnp.asarray(init0), weights=jnp.full((6,), 1e6), key=0)],
        {0: jnp.asarray(init0)},
    )
    print(f"update 0: {res.to_string()}")
    for i in range(1, 5):
        delta_gt = np.linalg.inv(T_gt[i - 1]) @ T_gt[i]
        noise = se3.se3_exp(jnp.asarray(rng.uniform(-0.1, 0.1, 6).astype(np.float32)))
        init = isam.calculate_estimate_pose(i - 1) @ delta_gt @ np.asarray(noise)
        res = isam.update(
            [make_vgicp_factor(i - 1, i, frames[i - 1], frames[i], voxel_resolution=1.0, min_voxel_points=4)],
            {i: jnp.asarray(init)},
        )
        print(f"update {i}: {res.to_string()}")

    # LATE LOOP CLOSURE: a VGICP factor to pose 0 — long since frozen. The
    # factor is realized as a pose-graph edge by a local pair registration,
    # the frozen chain + rigid window relax globally (optim/sparse.py), and
    # every estimate (frozen included) updates — the reference's fluid
    # relinearization / wildfire behavior (isam2_ext.cpp:425-520).
    frozen_before = {k: isam.frozen[k].copy() for k in isam.frozen}
    res = isam.update(
        [make_vgicp_factor(0, 4, frames[0], frames[4], voxel_resolution=1.0, min_voxel_points=4)]
    )
    print(f"loop  0<->4: {res.to_string()}")
    for k in sorted(frozen_before):
        dt = np.linalg.norm(isam.frozen[k][:3, 3] - frozen_before[k][:3, 3])
        print(f"  frozen pose {k} moved {dt * 1000:.2f} mm by the relax")

    est = isam.calculate_estimate()
    gauge = T_gt[0] @ np.linalg.inv(np.asarray(est[0]))
    print(f"\nwindow {isam.window}, frozen {sorted(isam.frozen)}, XLA programs built: {isam.num_compiles}")
    for i in range(5):
        T_err = np.linalg.inv(T_gt[i]) @ (gauge @ np.asarray(est[i]))
        xi = np.asarray(se3.se3_log(jnp.asarray(T_err[None]))[0])
        tag = "frozen" if i in isam.frozen else "active"
        print(f"pose {i} ({tag}): rot {np.linalg.norm(xi[:3]):.5f} rad, trans {np.linalg.norm(xi[3:]):.4f} m")


if __name__ == "__main__":
    main()
