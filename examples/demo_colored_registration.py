"""Colored registration on a geometry-degenerate scene (reference:
src/demo/demo_colored_registration.cpp — a flat plane with a painted ring;
pure geometric ICP slides along the plane, the photometric term locks it).

Run: python examples/demo_colored_registration.py [--platform cpu]
"""

from _common import setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gtsam_points_tpu.factors import (
        PriorFactor,
        make_colored_gicp_factor,
        make_gicp_factor,
    )
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import se3

    # flat plane z=0 with a painted ring at r=5 (the reference's scene:
    # intensity = scale where |dist-5| < 0.1, demo_colored_registration.cpp:60-70)
    rng = np.random.RandomState(0)
    n = 20000
    xy = rng.rand(n, 2).astype(np.float32) * 20 - 10
    pts = np.concatenate([xy, np.zeros((n, 1), np.float32)], axis=1)
    d = np.abs(np.linalg.norm(xy, axis=1) - 5.0)
    intens = (d < 0.1).astype(np.float32) * 1.0 + rng.randn(n).astype(np.float32) * 0.01

    target = estimate_normals_covs(make_frame(pts, intensities=intens), k=10, grid_leaf=1.0)
    T_true = se3.se3_exp(jnp.asarray([0.0, 0.0, 0.05, 0.4, -0.3, 0.0]))
    src = np.asarray(se3.transform_points(se3.se3_inverse(T_true), jnp.asarray(pts)))
    source = estimate_normals_covs(make_frame(src, intensities=intens), k=10, grid_leaf=1.0)

    for name, factor in (
        ("GICP", make_gicp_factor(0, 1, target, source, max_corr_dist=2.0)),
        (
            "ColoredGICP",
            make_colored_gicp_factor(0, 1, target, source, max_corr_dist=2.0, photometric_weight=20.0),
        ),
    ):
        graph = FactorGraph(num_poses=2)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
        graph.add(factor)
        res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=30)))(
            jnp.stack([jnp.eye(4), jnp.eye(4)])
        )
        rot_e, trans_e = se3.pose_error(T_true, res.poses[1])
        print(f"{name:>12}: rot err {float(rot_e):.4f} rad, trans err {float(trans_e):.4f} m"
              + ("   <-- slides along the plane" if float(trans_e) > 0.05 else "   (locked by photometric term)"))


if __name__ == "__main__":
    main()
