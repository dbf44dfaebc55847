"""Extended benchmark suite (bench.py prints the single headline line the
driver consumes; this prints one JSON line per metric for the full picture).

Configs follow BASELINE.json: pairwise registration, scan-to-map odometry,
frame-to-frame GICP — all on the bundled kitti_07_dump scans, real TPU.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import gtsam_points_tpu
    from gtsam_points_tpu.factors import make_vgicp_factor
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs, estimate_normals_covs_moments
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.pipelines.odometry import OdometryParams, init_odometry, odometry_step
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    def emit(metric, value, unit, baseline=None):
        rec = {"metric": metric, "value": round(value, 4), "unit": unit}
        if baseline:
            rec["vs_baseline"] = round(baseline / value, 2)
        print(json.dumps(rec), flush=True)

    cap = 25088
    pts0 = io.read_points("/root/reference/data/kitti_07_dump/000000/points.bin")
    pts1 = io.read_points("/root/reference/data/kitti_07_dump/000001/points.bin")
    raw_t = make_frame(pts0, capacity=cap)
    raw_s = make_frame(pts1, capacity=cap)

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    t0 = time.perf_counter()
    target = preprocess(raw_t)
    source = preprocess(raw_s)
    jax.block_until_ready(source.points)
    # preprocessing latency (downsample + covariances), per scan, steady state
    for _ in range(10):
        out = preprocess(raw_s)
    jax.block_until_ready(out.points)
    t0 = time.perf_counter()
    for _ in range(20):
        out = preprocess(raw_s)
    jax.block_until_ready(out.points)
    emit("preprocess_knn_ms_per_scan", (time.perf_counter() - t0) / 20 * 1000, "ms")

    # fast path: voxel-moments covariance estimation (ops/features.py)
    @jax.jit
    def preprocess_fast(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs_moments(f, leaf=1.0)

    out = preprocess_fast(raw_s)
    jax.block_until_ready(out.points)
    t0 = time.perf_counter()
    for _ in range(20):
        out = preprocess_fast(raw_s)
    jax.block_until_ready(out.points)
    emit("preprocess_ms_per_scan", (time.perf_counter() - t0) / 20 * 1000, "ms")

    # --- full VGICP pair registration (LM to convergence) ---
    vmap = jax.jit(lambda f: build_voxelmap(f, 1.0))(target)
    graph = FactorGraph(num_poses=1)
    graph.add(make_vgicp_factor(-1, 0, vmap, source, min_voxel_points=4))
    reg = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=10, max_inner_iterations=5)))
    out = reg(jnp.eye(4)[None])
    jax.block_until_ready(out.poses)
    t0 = time.perf_counter()
    for _ in range(20):
        out = reg(jnp.eye(4)[None])
    jax.block_until_ready(out.poses)
    ms = (time.perf_counter() - t0) / 20 * 1000
    emit("vgicp_registration_ms_per_scan", ms, "ms", baseline=30.0)
    print(json.dumps({"metric": "vgicp_registration_fps", "value": round(1000.0 / ms, 2),
                      "unit": "frames/s", "vs_baseline": round((1000.0 / ms) / (1000.0 / 30.0), 2)}), flush=True)

    # --- odometry step (register + map insert) ---
    params = OdometryParams(
        voxel_resolution=1.0, map_capacity=131072, min_voxel_points=4.0,
        max_iterations=10, keyframe_trans=1e-9, keyframe_rot=1e-9,  # insert every frame
    )
    state = init_odometry(target, params)
    # realistic per-scan work: start from a noised prediction every step so LM
    # does real iterations, and insert into the map every frame
    noise = se3.se3_exp(jnp.asarray([0.02, -0.02, 0.03, 0.1, -0.08, 0.05]))
    state, T, diag = odometry_step(state, source, params, noise)
    jax.block_until_ready(T)
    # steady-state throughput: chained steps, no host syncs (the step is one
    # jitted program), so consecutive scans pipeline like a real stream
    t0 = time.perf_counter()
    for _ in range(10):
        state, T, diag = odometry_step(state, source, params, noise)
    jax.block_until_ready(T)
    ms = (time.perf_counter() - t0) / 10 * 1000
    emit("odometry_step_ms_per_scan", ms, "ms", baseline=30.0)


if __name__ == "__main__":
    main()
