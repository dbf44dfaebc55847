"""On-TPU correctness parity run (once per round; VERDICT r1 item 4).

The test suite runs on CPU (the axon tunnel admits one client, so pytest
workers cannot share the chip — tests/conftest.py). This script is the
REAL-CHIP correctness pass: run sequentially on the tunneled TPU, it

1. compares the Pallas fused linearize/error kernels against the XLA planar
   path ON DEVICE (round 1 validated them only in Mosaic interpret mode),
2. runs the kitti_07 GICP and VGICP pair-registration convergence checks
   (reference bounds rot < 0.015 rad / trans < 0.15 m,
   src/test/test_matching_cost_factors.cpp:227-228) on the chip,
3. writes TPU_PARITY.json with every measurement so PARITY.md can cite an
   artifact instead of a claim.

Run: timeout 3600 python scripts/tpu_parity.py   (first compile is slow)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import gtsam_points_tpu  # noqa: F401
    from gtsam_points_tpu.factors import PriorFactor, make_gicp_factor, make_vgicp_factor
    from gtsam_points_tpu.ops import planar
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.ops.pallas_linearize import error_fused, linearize_fused
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    platform = jax.devices()[0].platform
    report = {
        "platform": platform,
        "device": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "checks": [],
    }
    ok_all = True

    def record(name, ok, **kw):
        nonlocal ok_all
        ok_all &= bool(ok)
        report["checks"].append({"name": name, "ok": bool(ok), **kw})
        print(f"[{'PASS' if ok else 'FAIL'}] {name} {kw}")

    # ---- 1) Pallas fused kernels vs planar XLA, on device ----------------
    rng = np.random.RandomState(0)
    n = 8192
    p_src = jnp.asarray(rng.randn(3, n).astype(np.float32) * 5)
    mu = p_src + jnp.asarray(rng.randn(3, n).astype(np.float32) * 0.1)
    A = rng.randn(n, 3, 3).astype(np.float32) * 0.2
    C = np.einsum("nij,nkj->nik", A, A) + 0.5 * np.eye(3, dtype=np.float32)
    W6 = jnp.asarray(
        np.stack([C[:, 0, 0], C[:, 0, 1], C[:, 0, 2], C[:, 1, 1], C[:, 1, 2], C[:, 2, 2]])
    )
    mask = jnp.asarray(rng.rand(n) > 0.1)
    delta = se3.se3_exp(jnp.asarray([0.03, -0.02, 0.05, 0.4, -0.2, 0.1], jnp.float32))

    lin_fused = jax.jit(linearize_fused)(p_src, mu, W6, mask, delta)

    def planar_ref(p_src, mu, W6, mask, delta):
        pm = planar.transform(delta, p_src)
        return planar.linearize_point_system(p_src, pm, pm - mu, W6, mask, delta[:3, :3])

    lin_plan = jax.jit(planar_ref)(p_src, mu, W6, mask, delta)

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))

    tol = 2e-4
    record(
        "pallas_linearize_vs_planar_on_device",
        max(rel(lin_fused.H_ss, lin_plan.H_ss), rel(lin_fused.b_s, lin_plan.b_s),
            rel(lin_fused.error, lin_plan.error)) < tol,
        H_ss_rel=rel(lin_fused.H_ss, lin_plan.H_ss),
        b_s_rel=rel(lin_fused.b_s, lin_plan.b_s),
        error_rel=rel(lin_fused.error, lin_plan.error),
        inliers_fused=int(lin_fused.num_inliers),
        inliers_planar=int(lin_plan.num_inliers),
    )

    e_fused = jax.jit(error_fused)(p_src, mu, W6, mask, delta)
    e_plan = float(
        jax.jit(lambda *a: planar.weighted_error(planar.transform(a[4], a[0]) - a[1], a[2], a[3]))(
            p_src, mu, W6, mask, delta
        )
    )
    record("pallas_error_vs_planar_on_device", rel(e_fused, e_plan) < tol,
           error_fused=float(e_fused), error_planar=e_plan)

    # ---- 2) kitti_07 pair convergence on the chip ------------------------
    data = os.environ.get("GTSAM_POINTS_DATA", "/root/reference/data")
    gt = io.load_graph(os.path.join(data, "kitti_07_dump/graph.txt"))
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))[:2]

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    frames = []
    for i in range(2):
        pts = io.read_points(os.path.join(data, f"kitti_07_dump/{i:06d}/points.bin"))
        frames.append(preprocess(make_frame(pts, capacity=25088)))

    delta_gt = jnp.asarray(np.linalg.inv(T_gt[0]) @ T_gt[1])
    noise = jnp.asarray(np.random.RandomState(42).uniform(-0.1, 0.1, 6).astype(np.float32))
    poses0 = jnp.stack([jnp.eye(4), delta_gt @ np.asarray(se3.se3_exp(noise))])

    for name, factor in (
        ("gicp", make_gicp_factor(0, 1, frames[0], frames[1], max_corr_dist=2.0)),
        ("vgicp", make_vgicp_factor(0, 1, frames[0], frames[1], voxel_resolution=1.0, min_voxel_points=4)),
    ):
        graph = FactorGraph(num_poses=2)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
        graph.add(factor)
        t0 = time.perf_counter()
        res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=30)))(poses0)
        jax.block_until_ready(res.poses)
        wall = time.perf_counter() - t0
        rot_e, trans_e = se3.pose_error(delta_gt, res.poses[1])
        record(
            f"kitti07_{name}_pair_convergence_on_device",
            float(rot_e) < 0.015 and float(trans_e) < 0.15,
            rot_err=float(rot_e),
            trans_err=float(trans_e),
            iterations=int(res.status.num_iterations),
            wall_s_incl_compile=round(wall, 2),
        )

    report["all_ok"] = ok_all
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "TPU_PARITY.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}; all_ok={ok_all}; platform={platform}")
    if platform == "cpu":
        print("WARNING: ran on CPU fallback — re-run on the tunneled TPU for a valid artifact")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
