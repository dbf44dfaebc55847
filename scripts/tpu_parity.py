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

# Recorded on-device timings (v5e via axon tunnel, round 4, marginal
# protocol). Each perf check GATES against its recorded number with a 20%
# regression allowance (VERDICT r3 item 5): a regression fails the check
# and flips all_ok. A check with no recorded baseline (new kernel) passes
# on the vs-XLA sanity bound alone and records its timing for the next
# round to pin.
PERF_BASELINES_MS = {
    # pinned from the round-5 run (2026-08-21): every kernel within noise of
    # its round-4 figure except the scan pipeline, which improved 0.0777 ->
    # 0.0558 (solve/ladder changes upstream of the kernel)
    "perf_linearize_fused_vs_xla_fallback": 0.0241,
    "perf_moments_fused_vs_xla_fallback": 0.0305,
    "perf_vgicp_scan_pipeline_kernel_vs_xla": 0.0558,
    "perf_unary_pallas_vs_xla": 0.0328,
    "perf_batched_pyramid_iteration": 6.44,
    "perf_unary_dense_vs_xla": 0.0179,
}
REGRESSION_GRACE = 1.2


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
    from gtsam_points_tpu.ops.pallas_linearize import linearize_fused
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

    # ---- 1b) moments-fused kernel vs its XLA equivalent, on device -------
    # (round 2 shipped this kernel correctness-checked only in interpret
    # mode; VERDICT r2 item 3 requires on-device coverage)
    from gtsam_points_tpu.ops.pallas_linearize import (
        linearize_vgicp_moments,
        linearize_vgicp_moments_xla,
    )

    cnt = jnp.asarray(rng.randint(1, 12, n).astype(np.float32))
    mu_t = p_src + jnp.asarray(rng.randn(3, n).astype(np.float32) * 0.1)
    s6 = jnp.asarray(
        np.stack([C[:, 0, 0], C[:, 0, 1], C[:, 0, 2], C[:, 1, 1], C[:, 1, 2], C[:, 2, 2]])
    )
    mu2 = jnp.stack(
        [mu_t[0] * mu_t[0], mu_t[0] * mu_t[1], mu_t[0] * mu_t[2],
         mu_t[1] * mu_t[1], mu_t[1] * mu_t[2], mu_t[2] * mu_t[2]]
    )
    momT = jnp.concatenate([cnt[None], mu_t * cnt[None], (s6 + mu2) * cnt[None]], axis=0)
    A2 = rng.randn(n, 3, 3).astype(np.float32) * 0.1
    Cs = np.einsum("nij,nkj->nik", A2, A2) + 0.05 * np.eye(3, dtype=np.float32)
    sc6 = jnp.asarray(
        np.stack([Cs[:, 0, 0], Cs[:, 0, 1], Cs[:, 0, 2], Cs[:, 1, 1], Cs[:, 1, 2], Cs[:, 2, 2]])
    )
    for variant, covs_arg in (("eps", None), ("src_covs", sc6)):
        lm_k = jax.jit(
            lambda *a, c=covs_arg: linearize_vgicp_moments(a[0], a[1], a[2], a[3], 3.0, 1e-3, c)
        )(p_src, momT, mask, delta)
        lm_x = jax.jit(
            lambda *a, c=covs_arg: linearize_vgicp_moments_xla(a[0], a[1], a[2], a[3], 3.0, 1e-3, c)
        )(p_src, momT, mask, delta)
        record(
            f"pallas_moments_{variant}_vs_xla_on_device",
            max(rel(lm_k.H_ss, lm_x.H_ss), rel(lm_k.b_s, lm_x.b_s), rel(lm_k.error, lm_x.error))
            < tol,
            H_ss_rel=rel(lm_k.H_ss, lm_x.H_ss),
            b_s_rel=rel(lm_k.b_s, lm_x.b_s),
            error_rel=rel(lm_k.error, lm_x.error),
            inliers_kernel=int(lm_k.num_inliers),
            inliers_xla=int(lm_x.num_inliers),
        )

    # ---- 1c) per-kernel on-device PERF gates: each Pallas kernel must not
    # be slower than the XLA fallback it ships alongside (the round-2 bench
    # regression was a 70x-pessimized kernel nobody timed on device;
    # VERDICT r2 item 3). Marginal protocol (fori_loop chains), 1.5x grace
    # for timing noise. ------------------------------------------------------
    from gtsam_points_tpu.utils.benchtime import chain_marginal

    def marginal_kernel_ms(fn, L1=100, L2=3100):
        def make_loop(lreps):
            @jax.jit
            def loop(d):
                def body(i, carry):
                    d, acc = carry
                    out = fn(d)
                    return (d.at[0, 3].add(1e-12 * out), acc + out)

                return jax.lax.fori_loop(0, lreps, body, (d, jnp.float32(0.0)))

            return loop

        loops = {L: make_loop(L) for L in (L1, L2)}
        for loop in loops.values():
            jax.block_until_ready(loop(delta))

        salt = [0]

        def run(L):
            # unique input per trial — repeated identical dispatches are
            # relay-replayable on this image (utils/benchtime.py)
            salt[0] += 1
            jax.block_until_ready(loops[L](delta.at[0, 3].add(salt[0] * 1e-6)))

        marg_s, _ = chain_marginal(run, L1, L2, trials=5)
        return marg_s * 1000.0

    def consume(lin):
        """Reduce a Linearized to one scalar that DEPENDS ON EVERY output.
        Benchmarked callables must consume H and b, not just the error — a
        .error-only probe lets XLA dead-code-eliminate the entire Jacobian/
        Hessian computation in the fallback while the fused kernel cannot,
        which is exactly the unfair race behind round 3's 0.26-0.42x
        "slowdowns" (and their apparent reversal here once fixed)."""
        return (
            lin.error
            + jnp.sum(lin.H_ss)
            + jnp.sum(lin.H_tt)
            + jnp.sum(lin.H_ts)
            + jnp.sum(lin.b_s)
            + jnp.sum(lin.b_t)
        )

    # Perf arrays at the production workload size (bench.py: 25088 lanes) —
    # at 8k lanes XLA's fused elementwise path wins on fixed overheads; the
    # kernels exist for the 25k+ regime they are dispatched at.
    n_perf = 25088
    reps = -(-n_perf // n)
    p_srcP = jnp.tile(p_src, (1, reps))[:, :n_perf]
    muP = jnp.tile(mu, (1, reps))[:, :n_perf]
    W6P = jnp.tile(W6, (1, reps))[:, :n_perf]
    maskP = jnp.tile(mask, (reps,))[:n_perf]
    momTP = jnp.tile(momT, (1, reps))[:, :n_perf]
    sc6P = jnp.tile(sc6, (1, reps))[:, :n_perf]

    perf_pairs = [
        (
            "linearize_fused",
            lambda d: consume(linearize_fused(p_srcP, muP, W6P, maskP, d)),
            lambda d: consume(planar.linearize_point_system(
                p_srcP, planar.transform(d, p_srcP), planar.transform(d, p_srcP) - muP, W6P, maskP, d[:3, :3]
            )),
        ),
        (
            "moments_fused",
            lambda d: consume(linearize_vgicp_moments(p_srcP, momTP, maskP, d, 3.0, 1e-3, sc6P)),
            lambda d: consume(linearize_vgicp_moments_xla(p_srcP, momTP, maskP, d, 3.0, 1e-3, sc6P)),
        ),
    ]
    if platform in ("tpu", "axon"):
        # Kernel-only gate at 3x: the XLA fallbacks are themselves excellent
        # (fully fused single pass), so the Pallas kernels race within ~±50%
        # of them on a frozen payload; this gate exists to catch the
        # round-2 class of pathology (the 70x-slow moments kernel), not to
        # adjudicate a 20% horse race — the pipeline-level race below (and
        # bench.py's in-bench race) does that.
        def record_perf(check_name, k_ms, x_ms, sanity=3.0):
            base = PERF_BASELINES_MS.get(check_name)
            degenerate = x_ms <= 1e-6  # tunnel noise swallowed the signal
            ok = degenerate or k_ms <= sanity * x_ms
            if base is not None:
                ok = ok and (k_ms <= REGRESSION_GRACE * base)
            record(
                check_name,
                ok,
                kernel_ms=round(k_ms, 4),
                xla_fallback_ms=round(x_ms, 4),
                speedup=round(x_ms / max(k_ms, 1e-9), 2),
                recorded_baseline_ms=base,
                measurement_degenerate=bool(degenerate),
                regression_gate=(
                    f"<= {REGRESSION_GRACE}x recorded" if base is not None
                    else "no recorded baseline (first round for this check)"
                ),
            )

        for name, kernel_fn, xla_fn in perf_pairs:
            k_ms = marginal_kernel_ms(kernel_fn)
            x_ms = marginal_kernel_ms(xla_fn)
            record_perf(f"perf_{name}_vs_xla_fallback", k_ms, x_ms)

    # ---- 1d) unary (source-block-only) kernel vs its XLA twin ------------
    from gtsam_points_tpu.ops.pallas_linearize import (
        linearize_vgicp_unary,
        linearize_vgicp_unary_xla,
    )

    for variant, covs_arg in (("eps", None), ("src_covs", sc6)):
        lu_k = jax.jit(
            lambda *a, c=covs_arg: linearize_vgicp_unary(a[0], a[1], a[2], a[3], 3.0, 1e-3, c)
        )(p_src, momT, mask, delta)
        lu_x = jax.jit(
            lambda *a, c=covs_arg: linearize_vgicp_unary_xla(a[0], a[1], a[2], a[3], 3.0, 1e-3, c)
        )(p_src, momT, mask, delta)
        record(
            f"pallas_unary_{variant}_vs_xla_on_device",
            max(rel(lu_k.H_ss, lu_x.H_ss), rel(lu_k.b_s, lu_x.b_s), rel(lu_k.error, lu_x.error))
            < 2e-3,
            H_ss_rel=rel(lu_k.H_ss, lu_x.H_ss),
            b_s_rel=rel(lu_k.b_s, lu_x.b_s),
            error_rel=rel(lu_k.error, lu_x.error),
        )

    from gtsam_points_tpu.ops.pallas_linearize import linearize_vgicp_unary_dense

    lu_d = jax.jit(
        lambda *a: linearize_vgicp_unary_dense(a[0], a[1], a[2], a[3], 3.0, 1e-3, sc6)
    )(p_src, momT, mask, delta)
    lu_xr = jax.jit(
        lambda *a: linearize_vgicp_unary_xla(a[0], a[1], a[2], a[3], 3.0, 1e-3, sc6)
    )(p_src, momT, mask, delta)
    record(
        "pallas_unary_dense_vs_xla_on_device",
        max(rel(lu_d.H_ss, lu_xr.H_ss), rel(lu_d.b_s, lu_xr.b_s), rel(lu_d.error, lu_xr.error))
        < 2e-3,
        H_ss_rel=rel(lu_d.H_ss, lu_xr.H_ss),
        b_s_rel=rel(lu_d.b_s, lu_xr.b_s),
        error_rel=rel(lu_d.error, lu_xr.error),
    )

    if platform in ("tpu", "axon"):
        k_ms = marginal_kernel_ms(
            lambda d: consume(linearize_vgicp_unary(p_srcP, momTP, maskP, d, 3.0, 1e-3, sc6P))
        )
        x_ms = marginal_kernel_ms(
            lambda d: consume(linearize_vgicp_unary_xla(p_srcP, momTP, maskP, d, 3.0, 1e-3, sc6P))
        )
        record_perf("perf_unary_pallas_vs_xla", k_ms, x_ms)
        d_ms = marginal_kernel_ms(
            lambda d: consume(linearize_vgicp_unary_dense(p_srcP, momTP, maskP, d, 3.0, 1e-3, sc6P))
        )
        record_perf("perf_unary_dense_vs_xla", d_ms, x_ms)

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

    # ---- 3) pipeline-level race on real data (the production decision:
    # vgicp_scan_linearize dispatches the moments kernel inside the full
    # probe + gather + linearize pipeline; it must not lose to the same
    # pipeline with the XLA fallback by more than 1.5x) -------------------
    if platform in ("tpu", "axon"):
        from gtsam_points_tpu.ops import voxel_keys as vk
        from gtsam_points_tpu.ops.pallas_linearize import vgicp_scan_linearize
        from gtsam_points_tpu.ops.voxelmap import build_voxelmap

        vm = jax.jit(lambda f: build_voxelmap(f, 1.0))(frames[0])
        q_p = frames[1].points.T
        q_mask = frames[1].mask

        def pipeline_kernel(d):
            return consume(vgicp_scan_linearize(vm, q_p, q_mask, d, 1.0))

        def pipeline_xla(d):
            pm = planar.transform(d, q_p)
            keys = vk.point_keys_planar(pm, q_mask, vm.leaf)
            from gtsam_points_tpu.ops.voxelmap import lookup_rows
            row, found = lookup_rows(vm, keys)
            momT_q = vm.moments[row].T[:10]
            return consume(linearize_vgicp_moments_xla(q_p, momT_q, found & q_mask, d, 1.0))

        k_ms = marginal_kernel_ms(pipeline_kernel, L1=20, L2=220)
        x_ms = marginal_kernel_ms(pipeline_xla, L1=20, L2=220)
        record_perf("perf_vgicp_scan_pipeline_kernel_vs_xla", k_ms, x_ms, sanity=1.5)

        # batched regime: one vmapped B=64 pyramid GN iteration (probe +
        # unary linearize + solve) — the production batched hot path.
        from gtsam_points_tpu.ops.pallas_linearize import probe_moments

        c1 = frames[1].covs
        covs6_1 = jnp.stack(
            [c1[:, 0, 0], c1[:, 0, 1], c1[:, 0, 2], c1[:, 1, 1], c1[:, 1, 2], c1[:, 2, 2]]
        )
        Bp = 64
        ds = jnp.broadcast_to(delta_gt, (Bp, 4, 4))

        def pyramid_iter(Ts):
            def one(T):
                momT_q, found = probe_moments(vm, q_p, q_mask, T)
                lin = linearize_vgicp_unary_xla(
                    q_p, momT_q, found, T, 1.0, src_covs6=covs6_1
                )
                return T.at[:3, 3].add(1e-12 * (lin.b_s[:3] + jnp.sum(lin.H_ss)))

            return jax.vmap(one)(Ts)

        loop64 = {
            L: jax.jit(
                lambda Ts, L=L: jax.lax.fori_loop(0, L, lambda i, T: pyramid_iter(T), Ts)
            )
            for L in (4, 24)
        }
        for loop in loop64.values():
            jax.block_until_ready(loop(ds))
        marg_s, _ = chain_marginal(lambda L: jax.block_until_ready(loop64[L](ds)), 4, 24, trials=3)
        b_ms = marg_s * 1000.0
        base = PERF_BASELINES_MS.get("perf_batched_pyramid_iteration")
        record(
            "perf_batched_pyramid_iteration",
            base is None or b_ms <= REGRESSION_GRACE * base,
            batched_iteration_ms=round(b_ms, 3),
            batch=Bp,
            recorded_baseline_ms=base,
            regression_gate=f"<= {REGRESSION_GRACE}x recorded" if base is not None else "first round",
        )

        # ---- 4) DISPATCH GATES (VERDICT r4 item 7): the production routing
        # must MATCH the measured winner per regime, as a gated invariant
        # rather than recorded prose. Tolerance 1.15x: a production path more
        # than 15% behind the best measured candidate fails the check.
        DISPATCH_TOL = 1.15

        def gate_dispatch(regime, production, candidates_ms):
            winner = min(candidates_ms, key=candidates_ms.get)
            prod_ms = candidates_ms[production]
            best_ms = candidates_ms[winner]
            record(
                f"dispatch_{regime}_matches_winner",
                prod_ms <= DISPATCH_TOL * best_ms,
                production=production,
                winner=winner,
                production_ms=round(prod_ms, 4),
                winner_ms=round(best_ms, 4),
                tolerance=DISPATCH_TOL,
                candidates={k: round(v, 4) for k, v in candidates_ms.items()},
            )

        # single-scan linearize: production = moments_fused Pallas pipeline
        ck = next(
            c for c in report["checks"]
            if c["name"] == "perf_vgicp_scan_pipeline_kernel_vs_xla"
        )
        gate_dispatch(
            "single_scan_linearize",
            "moments_fused_pallas",
            {"moments_fused_pallas": ck["kernel_ms"], "xla_pipeline": ck["xla_fallback_ms"]},
        )

        # batched linearize: production = vmapped unary XLA; candidate = the
        # one-launch batched Pallas unary kernel (linearize_vgicp_unary_batch)
        from gtsam_points_tpu.ops.pallas_linearize import linearize_vgicp_unary_batch

        def consume_b(lin):
            return jnp.sum(lin.b_s) + jnp.sum(lin.H_ss) + jnp.sum(lin.error)

        momT_b = jnp.broadcast_to(momTP, (Bp,) + momTP.shape)
        mask_b = jnp.broadcast_to(maskP, (Bp,) + maskP.shape)

        def batched_xla(d):
            ds_ = jnp.broadcast_to(d, (Bp, 4, 4)).at[:, 0, 3].add(
                1e-6 * jnp.arange(Bp, dtype=jnp.float32)
            )
            lin = jax.vmap(
                lambda mT, fd, T: linearize_vgicp_unary_xla(
                    p_srcP, mT, fd, T, 3.0, 1e-3, sc6P
                )
            )(momT_b, mask_b, ds_)
            return consume_b(lin)

        def batched_pallas(d):
            ds_ = jnp.broadcast_to(d, (Bp, 4, 4)).at[:, 0, 3].add(
                1e-6 * jnp.arange(Bp, dtype=jnp.float32)
            )
            lin = linearize_vgicp_unary_batch(
                p_srcP, momT_b, mask_b, ds_, 3.0, 1e-3, sc6P
            )
            return consume_b(lin)

        bx_ms = marginal_kernel_ms(batched_xla, L1=10, L2=110)
        bp_ms = marginal_kernel_ms(batched_pallas, L1=10, L2=110)
        gate_dispatch(
            "batched_linearize",
            "unary_xla_vmapped",
            {"unary_xla_vmapped": bx_ms, "unary_pallas_batched": bp_ms},
        )

        report["dispatch"] = {
            "single_scan_linearize": "moments_fused Pallas kernel behind "
            "vgicp_scan_linearize (table_probe sum-select; latency-bound regime)",
            "batched_registration": "linearize_vgicp_unary_xla (weighted) + "
            "probe_moments matmul slot-select over SOURCE CLUSTERS inside "
            "registration/cluster.py (throughput regime: the batch axis keeps "
            "the VPU dense; gated against the batched Pallas unary kernel by "
            "dispatch_batched_linearize_matches_winner above)",
            "error_path": "XLA planar (transform + weighted_error, fully "
            "fused by XLA). The dedicated Pallas error kernel was RETIRED in "
            "round 5: it measured speedup 0.96x vs this path (r4 "
            "perf_error_fused_vs_xla_fallback) — win-or-delete per VERDICT "
            "r4 item 7.",
        }

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
