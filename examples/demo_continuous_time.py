"""CT-ICP deskewing on the newer_06 scans (reference:
src/demo/demo_continuous_time.cpp): register the raw (motion-distorted) scan
against the deskewed target with a two-pose continuous-time factor, then
report the RMSE of the motion-compensated cloud.

Run: python examples/demo_continuous_time.py [--platform cpu]
"""

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gtsam_points_tpu.factors import PriorFactor, make_ct_icp_factor
    from gtsam_points_tpu.factors.ct_icp import deskew
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.ops.hash_grid import brute_force_knn
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    def rmse(f, tgt):
        _, sq, v = brute_force_knn(tgt.points, tgt.mask, f.points, f.mask, k=1, block=4096)
        sq = jnp.where(v[:, 0] & f.mask, sq[:, 0], 0.0)
        n = jnp.sum((v[:, 0] & f.mask).astype(jnp.float32))
        return float(jnp.sqrt(jnp.sum(sq) / jnp.maximum(n, 1.0)))

    for i in range(3):
        times = io.read_times(f"{DATA}/newer_06/times_{i:02d}.bin")
        raw = io.read_points(f"{DATA}/newer_06/raw_{i:02d}.bin") * np.array([-1, -1, 1], np.float32)
        desk = io.read_points(f"{DATA}/newer_06/deskewed_{i:02d}.bin")
        source = estimate_normals_covs(make_frame(raw, times=times, capacity=65536), k=20, grid_leaf=0.5)
        target = estimate_normals_covs(make_frame(desk, capacity=65536), k=20, grid_leaf=0.5)

        factor = make_ct_icp_factor(0, 1, target, source, gicp=True, max_corr_dist=1.0)
        graph = FactorGraph(num_poses=2)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e3), key=0))
        graph.add(factor)
        res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=30)))(
            jnp.stack([jnp.eye(4), jnp.eye(4)])
        )
        corrected = deskew(res.poses[0], res.poses[1], factor.source)
        xi = se3.se3_log(se3.se3_inverse(res.poses[0]) @ res.poses[1])
        print(
            f"scan {i}: intra-scan motion rot {float(jnp.linalg.norm(xi[:3])):.3f} rad "
            f"trans {float(jnp.linalg.norm(xi[3:])):.3f} m | "
            f"RMSE raw {rmse(source, target):.3f} -> deskewed {rmse(corrected, target):.3f} m"
        )


if __name__ == "__main__":
    main()
