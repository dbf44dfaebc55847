"""Multi-device scaling-efficiency harness (BASELINE.json: ">=80% efficiency
at 2 hosts", measured at 1 / 2 / N devices).

Measures the distributed hot op — fused linearize-all of a batched VGICP
factor graph with the [6P,6P] block system psum-reduced across the mesh
(parallel/distributed.py) — at every power-of-two device count available,
and reports strong-scaling efficiency  eff(n) = T(1) / (n * T(n)).

On this dev box there is ONE real TPU chip, so by default the harness runs on
the virtual CPU mesh (8 devices via xla_force_host_platform_device_count),
which exercises the identical sharding + collective program XLA would emit on
a pod slice. NOTE: virtual CPU devices share one host thread pool, so
wall-clock is flat across device counts there — the CPU run validates the
distributed program (and that sharding adds no overhead), it does not measure
speedup. On real multi-chip hardware (`--tpu`), the same script measures ICI
strong scaling and reports eff(n).

Prints one JSON line per device count:
  {"metric": "factor_linearize_n{N}dev_ms", ...} always, plus
  {"metric": "factor_linearize_scaling_eff_n{N}", ...} on real multi-device.
"""

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def build_problem(num_factors: int, points_per_scan: int):
    import jax.numpy as jnp

    from gtsam_points_tpu.factors.batch import make_vgicp_factor_batch
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import se3

    rng = np.random.RandomState(0)
    pts = []
    for ax in range(3):
        p = rng.rand(points_per_scan // 3, 3).astype(np.float32) * 20 - 10
        p[:, ax] = np.sign(p[:, ax]) * 10 + rng.randn(points_per_scan // 3).astype(np.float32) * 0.05
        pts.append(p)
    pts = np.concatenate(pts)
    target = make_frame(pts, capacity=points_per_scan)
    vmap = build_voxelmap(target, leaf=1.0, capacity=points_per_scan)

    vmaps, sources, t_keys, s_keys = [], [], [], []
    for i in range(num_factors):
        xi = jnp.asarray(rng.randn(6).astype(np.float32) * 0.05)
        T = se3.se3_exp(xi)
        src = np.asarray(se3.transform_points(se3.se3_inverse(T), jnp.asarray(pts)))
        vmaps.append(vmap)
        sources.append(make_frame(src, capacity=points_per_scan))
        t_keys.append(-1)
        s_keys.append(i)
    batch = make_vgicp_factor_batch(vmaps, sources, t_keys, s_keys, min_voxel_points=3.0)
    return batch, num_factors


def main():
    import jax

    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import gtsam_points_tpu  # noqa: F401  (pins matmul precision)
    from gtsam_points_tpu.optim import FactorGraph
    from gtsam_points_tpu.parallel import make_mesh
    from gtsam_points_tpu.parallel.distributed import shard_factor_batch

    n_avail = len(jax.devices())
    num_factors = 16
    points = 6144
    batch, P = build_problem(num_factors, points)

    def bench(n_dev: int) -> float:
        mesh = make_mesh(n_dev, axis="factor")
        sharded = shard_factor_batch(batch, mesh, axis="factor")
        graph = FactorGraph(num_poses=P)
        graph.add(sharded)
        poses0 = jnp.broadcast_to(jnp.eye(4), (P, 4, 4))
        reps = 10

        @jax.jit
        def loop(poses):
            def body(i, carry):
                poses, acc = carry
                A, b, err = graph.linearize_full(poses)
                poses = poses + 1e-9 * b.reshape(P, 6)[:, :1, None]
                return (poses, acc + err + jnp.sum(A) * 1e-30)

            return jax.lax.fori_loop(0, reps, body, (poses, jnp.float32(0.0)))

        out = loop(poses0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = loop(poses0)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1000.0

    real_multidevice = jax.devices()[0].platform != "cpu" and n_avail > 1
    counts = [n for n in (1, 2, 4, 8, 16) if n <= n_avail and num_factors % n == 0]
    t1 = None
    for n in counts:
        ms = bench(n)
        if t1 is None:
            t1 = ms
        print(
            json.dumps(
                {
                    "metric": f"factor_linearize_n{n}dev_ms",
                    "value": round(ms, 4),
                    "unit": "ms",
                    "devices": n,
                }
            ),
            flush=True,
        )
        if real_multidevice and n > 1:
            print(
                json.dumps(
                    {
                        "metric": f"factor_linearize_scaling_eff_n{n}",
                        "value": round(t1 / (n * ms), 4),
                        "unit": "x",
                        "devices": n,
                    }
                ),
                flush=True,
            )
    if not real_multidevice:
        print(
            json.dumps(
                {
                    "metric": "scaling_note",
                    "value": 1,
                    "unit": "collective program validated on virtual CPU mesh; "
                    "run with --tpu on a multi-chip slice for ICI efficiency",
                }
            ),
            flush=True,
        )

    # ---- map-sharded layout: voxel cells owned per device ----------------
    # Measures the shard_map linearize (local probe + local block reduce +
    # ONE Linearized psum) and reports the per-iteration collective payload —
    # the measurable proxy for scaling efficiency without multi-chip hardware
    # (the psum payload is constant in scan/map size, so communication time
    # is bounded and compute scales ~1/N).
    from gtsam_points_tpu.parallel import (
        build_sharded_voxelmap,
        collective_bytes_per_linearize,
        linearize_vgicp_sharded,
        place_sharded,
    )
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap as _bv
    from gtsam_points_tpu.types.frame import make_frame as _mf
    from gtsam_points_tpu.utils import se3 as _se3

    rng = np.random.RandomState(1)
    pts = rng.rand(points, 3).astype(np.float32) * 40 - 20
    target = _mf(pts, capacity=points)
    source = _mf(pts + rng.randn(points, 3).astype(np.float32) * 0.05, capacity=points)

    for n in [c for c in counts if c > 1]:
        mesh = make_mesh(n, axis="shard")
        svmap = place_sharded(
            build_sharded_voxelmap(target, 1.0, num_shards=n, capacity_per_shard=points // max(n // 2, 1)),
            mesh,
        )
        delta = jnp.eye(4)
        reps = 10

        @jax.jit
        def loop(svmap, src, delta):
            def body(i, carry):
                delta, acc = carry
                lin = linearize_vgicp_sharded(svmap, src, delta, mesh, min_voxel_points=1.0)
                delta = delta.at[:3, 3].add(1e-12 * lin.b_s[:3])
                return (delta, acc + lin.error)

            return jax.lax.fori_loop(0, reps, body, (delta, jnp.float32(0.0)))

        out = loop(svmap, source, delta)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = loop(svmap, source, delta)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1000.0
        print(
            json.dumps(
                {
                    "metric": f"map_sharded_linearize_n{n}dev_ms",
                    "value": round(ms, 4),
                    "unit": "ms",
                    "devices": n,
                }
            ),
            flush=True,
        )

    cb = collective_bytes_per_linearize()
    # per-linearize device-local HBM traffic, map-sharded layout:
    # per point ~ (12 B point read + 2x8 B hash-pair gathers + 64 B moment row
    # + ~64 B planar intermediates) — conservative 160 B/point
    compute_bytes = points * 160
    print(
        json.dumps(
            {
                "metric": "map_sharded_collective_bytes_per_linearize",
                "value": cb,
                "unit": "bytes",
                "note": f"constant in scan/map size; device-local HBM traffic ~{compute_bytes} B "
                f"(ratio {cb / compute_bytes:.2e}) -> communication-bound fraction is negligible, "
                "supporting the >=80%-at-2-hosts BASELINE target analytically",
            }
        ),
        flush=True,
    )

    # ---- single-real-chip ANCHORS for the modeled efficiency curve -------
    # (VERDICT r2 item 5: turn the bytes contract into a measured claim.)
    # On the one available TPU chip, measure the per-iteration compute time
    # of the production scan-to-map linearize on the real bench workload
    # (kitti_07, 25k points); combined with the constant psum payload above
    # and published ICI/DCN envelopes this yields the modeled
    # efficiency-vs-hosts curve in docs/DISTRIBUTED.md ("Measured scaling
    # model"). Runs only with --tpu (needs the real chip).
    if "--tpu" in sys.argv and jax.devices()[0].platform in ("tpu", "axon"):
        from gtsam_points_tpu.ops.features import estimate_normals_covs
        from gtsam_points_tpu.ops.pallas_linearize import vgicp_scan_linearize
        from gtsam_points_tpu.utils import io as _io

        cap = 25088
        p0 = _io.read_points("/root/reference/data/kitti_07_dump/000000/points.bin")
        p1 = _io.read_points("/root/reference/data/kitti_07_dump/000001/points.bin")
        prep = jax.jit(lambda f: estimate_normals_covs(f, k=10, grid_leaf=1.0))
        tgt = prep(_mf(p0, capacity=cap))
        src = prep(_mf(p1, capacity=cap))
        vm = jax.jit(lambda f: _bv(f, 1.0))(tgt)
        pts_p = src.points.T
        c = src.covs
        covs6 = jnp.stack(
            [c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]]
        )

        def make_loop(L):
            @jax.jit
            def loop(T):
                def body(i, carry):
                    T, acc = carry
                    lin = vgicp_scan_linearize(vm, pts_p, src.mask, T, 1.0, src_covs6=covs6)
                    return (T.at[:3, 3].add(1e-12 * lin.b_s[:3]), acc + lin.error)

                return jax.lax.fori_loop(0, L, body, (T, jnp.float32(0.0)))

            return loop

        # salted per-trial inputs (REPLAY HAZARD, utils/benchtime.py: repeated
        # bitwise-identical dispatches can be served from the relay cache —
        # the round-4 anchor's unsalted loop produced a NEGATIVE marginal
        # once), long chains (L2=510: ~50 ms of signal vs the ±3 ms tunnel
        # draw), 5 independent marginal runs, median published.
        L1, L2 = 10, 510
        loops = {L: make_loop(L) for L in (L1, L2)}
        for loop in loops.values():
            jax.block_until_ready(loop(jnp.eye(4)))
        salt = [0]

        def run_ms(L):
            salt[0] += 1
            t0 = time.perf_counter()
            jax.block_until_ready(loops[L](jnp.eye(4).at[0, 3].add(salt[0] * 1e-6)))
            return time.perf_counter() - t0

        marginals = []
        for _ in range(5):
            t1m = sorted(run_ms(L1) for _ in range(3))[1]
            t2m = sorted(run_ms(L2) for _ in range(3))[1]
            marginals.append((t2m - t1m) / (L2 - L1) * 1000.0)
        marginals.sort()
        anchor_ms = marginals[2]
        anchor_spread = {
            "min": round(marginals[0], 4), "max": round(marginals[-1], 4), "runs": 5,
        }
        # published interconnect envelopes (TPU v5e; jax-ml.github.io/scaling-book):
        ici_lat_s, dcn_lat_s = 2e-6, 50e-6  # small-payload allreduce latency
        ici_bw, dcn_bw = 45e9, 6.25e9  # bytes/s per link / per host
        t_comm_ici = ici_lat_s + cb / ici_bw
        t_comm_dcn = dcn_lat_s + cb / dcn_bw
        t1 = anchor_ms / 1000.0

        def eff_factor_axis(factors_per_host, hosts):
            comp = factors_per_host * t1
            return comp / (comp + t_comm_ici + (t_comm_dcn if hosts > 1 else 0.0))

        print(
            json.dumps(
                {
                    "metric": "tpu_1chip_scan_linearize_anchor_ms",
                    "value": round(anchor_ms, 4),
                    "spread": anchor_spread,
                    "unit": "ms",
                    "workload": "kitti_07 cov workload, 25088 pts (bench.py hot path)",
                    "psum_payload_bytes": cb,
                    "modeled_eff_2hosts_factor_axis": {
                        str(f): round(eff_factor_axis(f, 2), 4) for f in (1, 4, 16, 64)
                    },
                    "model": "eff = compute / (compute + ICI + DCN); ICI 2us+45GB/s, "
                    "DCN 50us+6.25GB/s (v5e envelopes); see docs/DISTRIBUTED.md",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
