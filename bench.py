"""Headline benchmark: VGICP fused linearization ms/scan on real KITTI data.

Measures the cost of ONE full scan-to-map VGICP linearization (voxel lookup +
GICP residuals + Jacobians + 12x12 block reduction) on the bundled
kitti_07_dump scans — the hot kernel of every LM iteration, equivalent to the
reference's GPU VGICP linearize pass
(/root/reference/src/gtsam_points/cuda/integrated_vgicp_derivatives_linearize.cu).

Baseline: the reference paper claims ~30 ms/scan for full VGICP registration on
CPU (Koide et al. ICRA2021, cited in /root/reference/README.md:23-25); the
reference repo itself publishes no numbers (BASELINE.md). vs_baseline reports
30ms / measured ms.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import gtsam_points_tpu  # pins f32 matmul precision
    from gtsam_points_tpu.factors import PriorFactor, make_vgicp_factor
    from gtsam_points_tpu.optim import FactorGraph
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    # Target map: scan 0; source: scan 1 (raw resolution, ~21k/25k points)
    cap = 25088
    pts0 = io.read_points("/root/reference/data/kitti_07_dump/000000/points.bin")
    pts1 = io.read_points("/root/reference/data/kitti_07_dump/000001/points.bin")
    target = make_frame(pts0, capacity=cap)
    source = make_frame(pts1, capacity=cap)

    from gtsam_points_tpu.ops.voxelmap import build_voxelmap

    vmap = jax.jit(lambda f: build_voxelmap(f, 0.5))(target)
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(make_vgicp_factor(0, 1, vmap, source, min_voxel_points=3))

    poses = jnp.stack([jnp.eye(4), jnp.eye(4)])

    reps = 50

    @jax.jit
    def bench_loop(poses):
        def body(i, carry):
            poses, acc = carry
            A, b, err = graph.linearize_full(poses)
            # consume the output and vary the input so iterations are not DCE'd
            poses = poses.at[1, :3, 3].add(1e-9 * b[6:9])
            return (poses, acc + err)

        return jax.lax.fori_loop(0, reps, body, (poses, jnp.float32(0.0)))

    # warmup/compile
    out = bench_loop(poses)
    jax.block_until_ready(out)

    # median of 5 timed loops — single-run wall clock on the tunneled TPU
    # varies by ~±20%, the median is stable
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = bench_loop(poses)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    elapsed = sorted(times)[len(times) // 2]

    ms_per_scan = elapsed / reps * 1000.0
    baseline_ms = 30.0  # reference paper-level CPU claim (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "vgicp_linearize_ms_per_scan",
                "value": round(ms_per_scan, 4),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms_per_scan, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
