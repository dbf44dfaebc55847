"""Canonical two-scan registration — the 30-line API tour
(reference: src/example/basic_scan_matching.cpp:17-49).

Run: python examples/basic_scan_matching.py [--platform cpu]
"""

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp

    from gtsam_points_tpu.factors import PriorFactor, make_gicp_factor
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    target = preprocess(make_frame(io.read_points(f"{DATA}/kitti_00/000000.bin"), capacity=131072))
    source = preprocess(make_frame(io.read_points(f"{DATA}/kitti_00/000001.bin"), capacity=131072))

    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(make_gicp_factor(0, 1, target, source, max_corr_dist=2.0))

    poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = jax.jit(lambda p: optimize_lm(graph, p))(poses0)

    T = res.poses[1]
    xi = se3.se3_log(T)
    print("estimated T_target_source:")
    print(jnp.round(T, 4))
    print(f"twist: rot {jnp.linalg.norm(xi[:3]):.4f} rad, trans {jnp.linalg.norm(xi[3:]):.3f} m")
    print(f"final error: {float(res.error):.3f}")


if __name__ == "__main__":
    main()
