"""Headline benchmark: batched VGICP registration throughput (frames/s/chip)
plus single-scan linearize latency, on real KITTI data — with in-bench
self-defense (path racing, tunnel-health probe, convergence gate).

Workload (the reference's own test protocol, src/test/
test_matching_cost_factors.cpp:84,181): kitti_07 scans 0/1, per-point
covariances (k=10 kNN, eig-regularized), leaf-1.0 Gaussian voxel map built
from the target frame, unary VGICP factor with fused mahalanobis
C_vox + R C_src R^T, initial poses = T_rel (graph.txt ground truth) composed
with uniform(-0.1, 0.1) twist noise. Round 2 registered from a near-identity
init ~3 m away from the true relative pose (21% voxel overlap) — a
non-convergent workload whose optimum wandered; the corrected protocol
converges to <0.01 m of ground truth on BOTH sides (the C++ baseline's
registration reports trans_err_vs_gt 0.0087 m, and this bench asserts its
own convergence below).

Measurements:
1. vgicp_registration_frames_per_s — B independent scan-to-map VGICP
   registrations run as ONE vmapped jitted program (round-5 SOURCE-CLUSTER
   GN pyramid, registration/cluster.py DEFAULT_CLUSTER_STAGES: the scan is
   aggregated per leaf-1.0 cell once in preprocessing and each GN
   iteration probes ~5.2k weighted cluster records instead of 25k points;
   3 basin-capture iters @ leaf 4.0 on stride-4 clusters, then leaf-1.0
   refinement at stride 2 -> 1; matmul slot-select probes; weighted unary
   linearize; unrolled 6x6 Cholesky solve). Both the TPU and the CPU
   baseline converge from the same +-0.1-twist inits; the 1024-seed
   robustness sweep worst lane is 0.0053 m / 0.00043 rad vs GT (reference
   bounds 0.15 m / 0.015 rad).
   quality_frames_per_s reports QUALITY_CLUSTER_STAGES (one extra
   full-resolution probe round). vs_baseline divides by the MEASURED CPU
   registration rate
   (REF_BASELINE.json, cov workload, best thread count). If the batch does
   not converge to ground truth within the reference accuracy bounds
   (rot < 0.015 rad, trans < 0.15 m — test_matching_cost_factors.cpp:227),
   vs_baseline is reported as 0.0: fast-but-wrong cannot score.
2. vgicp_linearize_ms_per_scan — one fused scan-to-map linearization
   (voxel lookup + fused covs + GICP residuals + Jacobians + block
   reduction). SIX candidate implementations are raced for a few
   iterations each and the fastest becomes the headline (VERDICT r2 item 2:
   the round-2 regression shipped because the bench trusted one kernel);
   all per-path timings are in the JSON so a regression is visible and
   non-fatal.
3. roofline — the hot paths are GATHER-RATE bound (a TPU row gather costs
   per-gather: 8..128-lane rows time identically), so the table reports
   the measured pipelined gather rate, each kernel's distance to its
   gather floor, and modeled HBM-bytes utilization.

Measurement protocol: STEADY-STATE MARGINAL cost (two chain lengths
K1 < K2 of data-dependent back-to-back executions, one final block;
(t2-t1)/(K2-K1) differences out the tunnel's fixed sync cost). Raw
(sync-inclusive) numbers and a tunnel-health probe (trivial dispatch ms)
are reported alongside.

Baseline: MEASURED on this host by native/src/ref_baseline.cpp (independent
C++/OpenMP implementation of the reference CPU VGICP pipeline; the reference
repo publishes no numbers and its own demo_benchmark needs a GTSAM build,
unavailable here). See REF_BASELINE.json.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

ROT_TOL = 0.015  # rad — reference bound, test_matching_cost_factors.cpp:227
TRANS_TOL = 0.15  # m   — reference bound, test_matching_cost_factors.cpp:228


def _load_ref_baseline():
    """-> dict of best-thread measured CPU numbers from REF_BASELINE.json."""
    out = {
        "registration_ms": 18.918,  # fallback: the 2026-08-21 measurement
        "linearize_ms": 3.3888,
        "registration_ms_1t": 34.009,
        "linearize_ms_1t": 3.4169,
    }
    try:
        ref = json.load(open(os.path.join(os.path.dirname(__file__), "REF_BASELINE.json")))
        reg = [m["value"] for m in ref["measurements"] if m["metric"] == "ref_cpu_vgicp_registration_cov_ms"]
        lin = [m["value"] for m in ref["measurements"] if m["metric"] == "ref_cpu_vgicp_linearize_cov_ms_per_scan"]
        if reg:
            out["registration_ms"] = min(reg)
            out["registration_ms_1t"] = max(reg)
        if lin:
            out["linearize_ms"] = min(lin)
            out["linearize_ms_1t"] = max(lin)
    except Exception:
        pass
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import gtsam_points_tpu  # noqa: F401  (pins f32 matmul precision)
    from gtsam_points_tpu.ops import planar
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.ops.pallas_linearize import linearize_fused, vgicp_scan_linearize
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap, lookup_fetch_planar
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    from gtsam_points_tpu.utils.benchtime import chain_marginal, tunnel_probe_ms

    # tunnel-health probe (fixed sync cost of this dev image's TPU tunnel;
    # NOT part of any metric, recorded so a degraded-tunnel run is
    # distinguishable from a kernel regression)
    tunnel_ms = tunnel_probe_ms()

    # ---- workload -------------------------------------------------------
    cap = 25088
    data = io.data_root()
    pts0 = io.read_points(os.path.join(data, "kitti_07_dump/000000/points.bin"))
    pts1 = io.read_points(os.path.join(data, "kitti_07_dump/000001/points.bin"))
    g = io.load_graph(os.path.join(data, "kitti_07_dump/graph.txt"))
    T_rel = se3.se3_inverse(se3.pose_from_xyzq(jnp.asarray(g[0]))) @ se3.pose_from_xyzq(
        jnp.asarray(g[1])
    )

    prep = jax.jit(lambda f: estimate_normals_covs(f, k=10, grid_leaf=1.0))
    target = prep(make_frame(pts0, capacity=cap))
    source = prep(make_frame(pts1, capacity=cap))
    vmap = jax.jit(lambda f: build_voxelmap(f, 1.0))(target)

    pts_p = source.points.T  # [3, N] planar
    c = source.covs
    covs6 = jnp.stack([c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]])
    mask = source.mask

    # ---- 1) batched registration throughput ------------------------------
    # SOURCE-CLUSTER coarse-to-fine GN pyramid (round 5): the source scan is
    # aggregated per voxel cell ONCE in preprocessing (pose-independent —
    # centroid, fused covariance, weight = count; registration/cluster.py),
    # and every GN iteration probes ~5.2k cluster records instead of 25k
    # points (the probe costs per-GATHER, and points sharing a cell
    # re-gathered the same record ~5x). The 6x6 GN solve is the unrolled
    # straight-line Cholesky (utils/solve6.py). Schedule chosen by the
    # round-5 ROBUSTNESS sweep (1024 random inits): DEFAULT_CLUSTER_STAGES
    # = 3 iters @ leaf 4.0 on stride-4 clusters (the 3rd coarse iteration
    # is what makes every-init basin capture reliable), then leaf-1.0
    # refinement at stride 2 -> 1; worst lane 0.0053 m / 0.00043 rad
    # (reference bounds 0.15 m / 0.015 rad). QUALITY preset adds one more
    # full-resolution probe round.
    B = 64
    from gtsam_points_tpu.registration import (
        DEFAULT_CLUSTER_CAPACITY, DEFAULT_CLUSTER_LEAF, DEFAULT_CLUSTER_STAGES,
        QUALITY_CLUSTER_STAGES, build_pyramid, cluster_source,
        register_clusters_pyramid)

    # preprocessing product (outside the timed chain, like the per-point
    # covariances): one sort + segment-add per frame
    clusters = jax.jit(
        lambda s: cluster_source(s, DEFAULT_CLUSTER_LEAF, DEFAULT_CLUSTER_CAPACITY)
    )(source)
    maps = jax.jit(lambda f: build_pyramid(f, DEFAULT_CLUSTER_STAGES))(target)
    batched_register = jax.jit(
        jax.vmap(lambda T0: register_clusters_pyramid(maps, clusters, T0))
    )
    maps_q = jax.jit(lambda f: build_pyramid(f, QUALITY_CLUSTER_STAGES))(target)
    batched_register_q = jax.jit(
        jax.vmap(
            lambda T0: register_clusters_pyramid(
                maps_q, clusters, T0, QUALITY_CLUSTER_STAGES
            )
        )
    )

    rng = np.random.RandomState(0)
    xis = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)).astype(np.float32))
    T0s = jax.vmap(lambda xi: T_rel @ se3.se3_exp(xi))(xis)

    Ts = batched_register(T0s)
    jax.block_until_ready(Ts)

    # convergence gate: every lane within the reference accuracy bounds
    rot_e, trans_e = jax.vmap(lambda T: se3.pose_error(T, T_rel))(Ts)
    max_rot = float(jnp.max(rot_e))
    max_trans = float(jnp.max(trans_e))
    converged = bool(max_rot < ROT_TOL and max_trans < TRANS_TOL)

    _salt = [0]

    def make_reg_chain(reg_fn):
        """K back-to-back batched registrations, one final FULL fetch. Each
        element re-registers from the ORIGINAL perturbed inits plus a
        VALUE-SIGNIFICANT salt (1e-4 m translation — far below the accuracy
        scale but well above f32 rounding, unique per element and per
        trial) plus a dependency on the previous output, so the chain is
        sequential and no element is bitwise-repeatable — see the REPLAY
        HAZARD note in utils/benchtime.py. Chaining converged poses
        directly would measure re-registration of already-converged poses,
        not the real from-init workload."""

        def chain(K):
            cur = T0s
            for _ in range(K):
                _salt[0] += 1
                T_in = T0s.at[:, :3, 3].add(_salt[0] * 1e-4 + 1e-9 * cur[:, :3, 3])
                cur = reg_fn(T_in)
            float(jnp.sum(cur))

        return chain

    def measure_reg(reg_fn, repeats=5):
        """At cluster speeds one batch is ~5 ms, so chains are longer
        (K 4->12) and the measurement repeats 5x with the headline = median
        and the spread published (round-5: identical compiled programs
        showed >2x run-to-run tunnel variance at short chains)."""
        chain = make_reg_chain(reg_fn)
        runs, raws = [], []
        for _ in range(repeats):
            m, r = chain_marginal(chain, 8, 24, trials=3)
            runs.append(m)
            raws.append(r)
        runs.sort()
        med = runs[len(runs) // 2]
        spread = {
            "min_fps": round(B / runs[-1], 1),
            "max_fps": round(B / runs[0], 1),
            "spread_pct": round(100.0 * (runs[-1] - runs[0]) / max(med, 1e-12), 1),
            "runs": repeats,
        }
        return B / med, B / (sorted(raws)[len(raws) // 2]), spread

    frames_per_s, raw_frames_per_s, reg_spread = measure_reg(batched_register)

    # quality preset: same protocol, QUALITY_CLUSTER_STAGES schedule
    Ts_q = batched_register_q(T0s)
    rot_q, trans_q = jax.vmap(lambda T: se3.pose_error(T, T_rel))(Ts_q)
    quality_frames_per_s, _, _ = measure_reg(batched_register_q, repeats=3)

    # ---- 2) single-scan linearize latency: RACE the candidate paths -----
    def lin_moments(T):
        return vgicp_scan_linearize(vmap, pts_p, mask, T, 1.0, src_covs6=covs6)

    def lin_planar_fused(T):
        pm = planar.transform(T, pts_p)
        found, cnt, mu, C6 = lookup_fetch_planar(vmap, pm, mask)
        W6 = planar.sym_inv(C6 + planar.sym_rotate(T[:3, :3], covs6))
        return linearize_fused(pts_p, mu, W6, found & mask, T)

    def lin_planar_xla(T):
        pm = planar.transform(T, pts_p)
        found, cnt, mu, C6 = lookup_fetch_planar(vmap, pm, mask)
        W6 = planar.sym_inv(C6 + planar.sym_rotate(T[:3, :3], covs6))
        return planar.linearize_point_system(
            pts_p, pm, pm - mu, W6, found & mask, T[:3, :3]
        )

    def make_loop(fn, lreps):
        @jax.jit
        def bench_loop(T):
            def body(i, carry):
                T, acc = carry
                lin = fn(T)
                T = T.at[:3, 3].add(1e-9 * lin.b_s[:3])
                return (T, acc + lin.error)

            return jax.lax.fori_loop(0, lreps, body, (T, jnp.float32(0.0)))

        return bench_loop

    def marginal_lin_ms(fn, L1=10, L2=110):
        loops = {L: make_loop(fn, L) for L in (L1, L2)}
        for loop in loops.values():  # compile + warm
            jax.block_until_ready(loop(T_rel))

        salt = [0]

        def run(L):
            # unique input per trial (replay hazard, utils/benchtime.py)
            salt[0] += 1
            jax.block_until_ready(loops[L](T_rel.at[0, 3].add(salt[0] * 1e-6)))

        marg_s, raw_s = chain_marginal(run, L1, L2, trials=5)
        return marg_s * 1000.0, raw_s * 1000.0

    from gtsam_points_tpu.ops.pallas_linearize import (
        linearize_vgicp_unary, linearize_vgicp_unary_dense,
        linearize_vgicp_unary_xla, probe_moments)

    def lin_unary_pallas(T):
        momT, found = probe_moments(vmap, pts_p, mask, T)
        return linearize_vgicp_unary(pts_p, momT, found, T, 1.0, src_covs6=covs6)

    def lin_unary_xla(T):
        momT, found = probe_moments(vmap, pts_p, mask, T)
        return linearize_vgicp_unary_xla(pts_p, momT, found, T, 1.0, src_covs6=covs6)

    def lin_unary_dense(T):
        momT, found = probe_moments(vmap, pts_p, mask, T)
        return linearize_vgicp_unary_dense(pts_p, momT, found, T, 1.0, src_covs6=covs6)

    paths = {
        "moments_fused": lin_moments,
        "planar_fused": lin_planar_fused,
        "planar_xla": lin_planar_xla,
        "unary_pallas": lin_unary_pallas,
        "unary_xla": lin_unary_xla,
        "unary_dense": lin_unary_dense,
    }
    path_ms = {}
    path_raw_ms = {}
    for name, fn in paths.items():
        try:
            path_ms[name], path_raw_ms[name] = marginal_lin_ms(fn)
        except Exception as e:  # noqa: BLE001 — a broken path must not kill the bench
            path_ms[name] = float("inf")
            path_raw_ms[name] = float("inf")
            path_ms[name + "_error"] = repr(e)[:120]
    best_path = min((k for k in paths), key=lambda k: path_ms[k])
    raw_ms_per_scan = path_raw_ms[best_path]
    # stability: re-measure the winner 5 times with fresh chains; headline =
    # median, spread published (VERDICT r3 item 9)
    # longer chains for the winner: at L2=110 the ~9 ms signal is within
    # tunnel noise (+-3 ms -> +-33%/draw); L2=510 gives ~45 ms of signal
    winner_runs = []
    for _ in range(5):
        m, _ = marginal_lin_ms(paths[best_path], L1=10, L2=510)
        winner_runs.append(m)
    winner_runs.sort()
    ms_per_scan = winner_runs[len(winner_runs) // 2]
    lin_spread = {
        "min": round(winner_runs[0], 4),
        "max": round(winner_runs[-1], 4),
        "spread_pct": round(100.0 * (winner_runs[-1] - winner_runs[0]) / max(ms_per_scan, 1e-9), 1),
        "runs": 5,
    }

    # ---- 3) roofline evidence ------------------------------------------
    # The hot path is GATHER-RATE bound, not stream-bandwidth bound: a TPU
    # row gather costs per-GATHER (measured identical for 8..128-lane rows),
    # so the relevant roofline is gathers/s, plus modeled HBM bytes for the
    # streaming side. Micro-measure the probe gather on this chip:
    # pipelined-throughput gather rate: 64 independent [N] row gathers per
    # step (matches the batched hot path), scalar-chained between steps so
    # nothing is elided but in-step gathers pipeline freely
    h_idx = jnp.asarray(
        np.random.RandomState(1).randint(0, vmap.table.shape[0], (64, cap)), jnp.int32
    )
    gather_one = jax.jit(
        lambda h: vmap.table[h].sum(axis=-1).sum(axis=-1).astype(jnp.int32)
    )

    gsalt = [0]

    def gather_chain(K):
        gsalt[0] += 1
        h = (h_idx + gsalt[0]) % vmap.table.shape[0]  # unique per trial
        for _ in range(K):
            h = (h_idx + gsalt[0] + (gather_one(h)[:, None] & 1)) % vmap.table.shape[0]
        jax.block_until_ready(h)

    g_marg_s, _ = chain_marginal(gather_chain, 2, 8, trials=3)
    ns_per_gather = g_marg_s / (64 * cap) * 1e9
    HBM_PEAK_GBPS = 819.0  # v5e datasheet
    # modeled per-scan HBM bytes for the full linearize (probe read N*512 +
    # gather out N*512 + select passes ~2*N*512 + kernel rows ~80 B/pt)
    lin_bytes = cap * (512 * 4 + 80)
    lin_eff_gbps = lin_bytes / (ms_per_scan / 1e3) / 1e9
    # registration: cluster records probed per frame across the stride
    # ladder (the dedup moved the floor itself: fewer rows to gather)
    probes_per_frame = sum(
        st.iters * (DEFAULT_CLUSTER_CAPACITY // st.stride)
        for st in DEFAULT_CLUSTER_STAGES
    )
    reg_gather_floor_s = probes_per_frame * ns_per_gather / 1e9
    roofline = {
        "ns_per_row_gather_measured": round(ns_per_gather, 2),
        "linearize_modeled_bytes_mb": round(lin_bytes / 1e6, 1),
        "linearize_effective_gbps": round(lin_eff_gbps, 1),
        "linearize_hbm_utilization": round(lin_eff_gbps / HBM_PEAK_GBPS, 3),
        "linearize_gather_floor_ms": round(cap * ns_per_gather / 1e6, 4),
        "registration_probed_points_per_frame": int(probes_per_frame),
        "registration_gather_floor_frames_per_s": round(1.0 / reg_gather_floor_s, 1),
        "registration_gather_floor_utilization": round(
            frames_per_s * reg_gather_floor_s, 3
        ),
    }

    ref = _load_ref_baseline()
    ref_frames_per_s = 1000.0 / ref["registration_ms"]
    vs_baseline = frames_per_s / ref_frames_per_s if converged else 0.0
    print(
        json.dumps(
            {
                "metric": "vgicp_registration_frames_per_s",
                "value": round(frames_per_s, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(vs_baseline, 2),
                "converged": converged,
                "max_rot_err_vs_gt_rad": round(max_rot, 5),
                "max_trans_err_vs_gt_m": round(max_trans, 5),
                "batch": B,
                "baseline_frames_per_s": round(ref_frames_per_s, 2),
                "baseline_1thread_ms": {
                    "registration": ref["registration_ms_1t"],
                    "linearize": ref["linearize_ms_1t"],
                },
                "raw_frames_per_s": round(raw_frames_per_s, 2),
                "raw_vs_baseline": round(raw_frames_per_s / ref_frames_per_s, 2) if converged else 0.0,
                "registration_spread": reg_spread,
                "registration_path": "source-cluster GN pyramid "
                "(registration/cluster.py DEFAULT_CLUSTER_STAGES; clusters = "
                f"leaf-{DEFAULT_CLUSTER_LEAF} per-cell aggregation, capacity "
                f"{DEFAULT_CLUSTER_CAPACITY}, built once per frame in "
                "preprocessing alongside covariances)",
                "linearize_ms_per_scan": round(ms_per_scan, 4),
                "linearize_vs_baseline": round(ref["linearize_ms"] / ms_per_scan, 2),
                "raw_linearize_ms_per_scan": round(raw_ms_per_scan, 4),
                "linearize_path": best_path,
                "linearize_spread": lin_spread,
                "quality_frames_per_s": round(quality_frames_per_s, 2),
                "quality_vs_baseline": round(quality_frames_per_s / ref_frames_per_s, 2),
                "quality_max_trans_err_vs_gt_m": round(float(jnp.max(trans_q)), 5),
                "quality_max_rot_err_vs_gt_rad": round(float(jnp.max(rot_q)), 5),
                "roofline": roofline,
                "linearize_paths_ms": {
                    k: (
                        round(v, 4)
                        if isinstance(v, float) and v == v and v != float("inf")
                        else (v if isinstance(v, str) else "failed")
                    )
                    for k, v in path_ms.items()
                },
                "tunnel_dispatch_ms": round(tunnel_ms, 4),
                "workload": "cov (reference test protocol; see REF_BASELINE.json)",
                "protocol": "steady-state marginal (two chain lengths differenced; "
                "raw_* = sync-inclusive)",
                "baseline_source": "REF_BASELINE.json (measured, native/src/ref_baseline.cpp, "
                "best thread count)",
            }
        )
    )


if __name__ == "__main__":
    main()
