"""Headline benchmark: batched VGICP registration throughput (frames/s/chip)
plus single-scan linearize latency, on real KITTI data.

Two measurements:
1. vgicp_registration_frames_per_s — B independent scan-to-map VGICP
   registrations (fixed 8-iteration Gauss-Newton, unary pose) run as ONE
   vmapped jitted program whose per-iteration hot path is the fused Pallas
   linearize kernel (ops/pallas_linearize.py). This is how a TPU should run
   registration in production (BASELINE.json primary metric "registration
   frames/s/chip"); the batch axis is what the MXU/VPU want and what the
   single-stream CPU baseline cannot do.
2. vgicp_linearize_ms_per_scan — one fused scan-to-map linearization
   (voxel lookup + GICP residuals + Jacobians + 12x12 block reduction),
   the hot kernel of every LM iteration (equivalent of the reference's GPU
   linearize pass, src/gtsam_points/cuda/integrated_vgicp_derivatives_linearize.cu).

Measurement protocol: STEADY-STATE MARGINAL cost. The tunneled TPU in this
image adds a large fixed synchronization cost (~24 ms) to every host-blocking
round trip of a program that contains a device loop — overhead of the
development tunnel, not of the TPU program (a plain chained dispatch of
loop-free programs syncs in ~0.1 ms). Both metrics therefore time two chain
lengths K1 < K2 of back-to-back executions (data-dependent, so nothing can be
elided) with ONE final block, and report (t(K2) - t(K1)) / (K2 - K1): the
per-execution cost with the constant tunnel term differenced out. Raw
(sync-inclusive) numbers are included in the JSON for transparency.

Baseline: MEASURED on this host by native/src/ref_baseline.cpp — an
independent C++/OpenMP implementation of the reference's CPU VGICP pipeline
on the identical workload (the reference repo publishes no numbers and its
own demo_benchmark needs a GTSAM build, unavailable in this image; see
REF_BASELINE.json). vs_baseline compares like-for-like: batched TPU
frames/s vs measured CPU registrations/s (best thread count), and
linearize ms vs measured CPU linearize ms.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np


def _load_ref_baseline():
    """-> (registration_ms, linearize_ms) measured CPU numbers (best thread)."""
    reg_ms, lin_ms = 10.967, 0.7258  # fallback: the 2026-08-20 measurement
    try:
        ref = json.load(open(os.path.join(os.path.dirname(__file__), "REF_BASELINE.json")))
        reg = [m["value"] for m in ref["measurements"] if m["metric"] == "ref_cpu_vgicp_registration_ms"]
        lin = [m["value"] for m in ref["measurements"] if m["metric"] == "ref_cpu_vgicp_linearize_ms_per_scan"]
        if reg:
            reg_ms = min(reg)
        if lin:
            lin_ms = min(lin)
    except Exception:
        pass
    return reg_ms, lin_ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import gtsam_points_tpu  # pins f32 matmul precision
    from gtsam_points_tpu.ops.pallas_linearize import vgicp_scan_linearize
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    # Target map: scan 0; source: scan 1 (raw resolution, ~21k/25k points)
    cap = 25088
    pts0 = io.read_points("/root/reference/data/kitti_07_dump/000000/points.bin")
    pts1 = io.read_points("/root/reference/data/kitti_07_dump/000001/points.bin")
    target = make_frame(pts0, capacity=cap)
    source = make_frame(pts1, capacity=cap)

    vmap = jax.jit(lambda f: build_voxelmap(f, 0.5))(target)
    pts_p = source.points.T  # [3, N] planar
    mask = source.mask

    # ---- 1) batched registration throughput ------------------------------
    B = 64  # sweep (pallas path, marginal f/s): 530 at B=64; 281 at B=128
    #         (VMEM pressure); planar path peaks at 389 (B=64)
    GN_ITERS = 8  # matches the CPU baseline's convergence work (3 LM outers
    #               x (1 linearize + ~2 error evals); GN converges by ~5 here)

    def gn_register(T0):
        """Unary VGICP registration: fixed target map, optimize source pose.
        Per-iteration hot path = moments-fused Pallas kernel (probe + raw
        moment gather in XLA; finalize + weights + Jacobians + MXU block
        reduction in one VMEM-resident pass)."""

        def body(i, T):
            lin = vgicp_scan_linearize(vmap, pts_p, mask, T, 3.0)
            H = lin.H_ss + 1e-6 * jnp.eye(6)
            xi = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H, lower=True), lin.b_s)
            return T @ se3.se3_exp(xi)

        return jax.lax.fori_loop(0, GN_ITERS, body, T0)

    batched_register = jax.jit(jax.vmap(gn_register))

    rng = np.random.RandomState(0)
    xis = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)).astype(np.float32))
    T0s = jax.vmap(se3.se3_exp)(xis)

    out = batched_register(T0s)
    jax.block_until_ready(out)

    def chain_time(K, trials=3):
        """Median wall time of K back-to-back executions, one final sync.
        Output feeds the next input, so the chain is truly sequential."""
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            cur = T0s
            for _ in range(K):
                cur = batched_register(cur)
            jax.block_until_ready(cur)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    K1, K2 = 2, 8
    t1, t2 = chain_time(K1), chain_time(K2)
    marginal_s = (t2 - t1) / (K2 - K1)
    raw_s = t2 / K2
    frames_per_s = B / marginal_s

    # ---- 2) single-scan linearize latency --------------------------------
    # One fused linearize (transform + voxel lookup + weights + Pallas
    # linearize) iterated L times inside one program; marginal over two L.
    def make_loop(lreps):
        @jax.jit
        def bench_loop(T):
            def body(i, carry):
                T, acc = carry
                lin = vgicp_scan_linearize(vmap, pts_p, mask, T, 3.0)
                T = T.at[:3, 3].add(1e-9 * lin.b_s[3:])
                return (T, acc + lin.error)

            return jax.lax.fori_loop(0, lreps, body, (T, jnp.float32(0.0)))

        return bench_loop

    L1, L2 = 10, 210
    loops = {L: make_loop(L) for L in (L1, L2)}
    T0 = jnp.eye(4)
    times = {}
    for L, fn in loops.items():
        o = fn(T0)
        jax.block_until_ready(o)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = fn(T0)
            jax.block_until_ready(o)
            ts.append(time.perf_counter() - t0)
        times[L] = sorted(ts)[len(ts) // 2]
    ms_per_scan = (times[L2] - times[L1]) / (L2 - L1) * 1000.0
    raw_ms_per_scan = times[L2] / L2 * 1000.0

    ref_reg_ms, ref_lin_ms = _load_ref_baseline()
    ref_frames_per_s = 1000.0 / ref_reg_ms
    print(
        json.dumps(
            {
                "metric": "vgicp_registration_frames_per_s",
                "value": round(frames_per_s, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(frames_per_s / ref_frames_per_s, 2),
                "batch": B,
                "gn_iters": GN_ITERS,
                "baseline_frames_per_s": round(ref_frames_per_s, 2),
                "raw_frames_per_s": round(B / raw_s, 2),
                "linearize_ms_per_scan": round(ms_per_scan, 4),
                "linearize_vs_baseline": round(ref_lin_ms / ms_per_scan, 2),
                "raw_linearize_ms_per_scan": round(raw_ms_per_scan, 4),
                "protocol": "steady-state marginal (two chain lengths differenced; "
                "raw_* = sync-inclusive)",
                "baseline_source": "REF_BASELINE.json (measured, native/src/ref_baseline.cpp)",
            }
        )
    )


if __name__ == "__main__":
    main()
