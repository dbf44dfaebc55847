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

    from gtsam_points_tpu.utils.benchtime import chain_marginal, tunnel_probe_ms

    # tunnel-health probe bracketing the whole suite: the tunneled TPU in
    # this image INTERMITTENTLY degrades (per-dispatch cost can grow several
    # ms for minutes at a time); these rows let a reader tell a degraded-
    # tunnel artifact from a real regression
    print(json.dumps({"metric": "tunnel_dispatch_ms_at_start",
                      "value": round(tunnel_probe_ms(), 4), "unit": "ms"}), flush=True)

    def marginal_ms(run_chain, K1=5, K2=15, trials=3, reps=1):
        """Steady-state marginal per-execution ms (shared protocol,
        utils/benchtime.chain_marginal): run_chain(K) dispatches K
        back-to-back executions and blocks ONCE; two chain lengths are
        differenced to exclude the tunnel's fixed per-sync cost (~24 ms for
        programs containing device loops — see bench.py docstring).
        `reps` > 1 repeats the whole marginal estimate and takes the median
        (round 5: single-dispatch chains of ms-scale while_loop programs
        show >2x run-to-run tunnel variance)."""
        runs = sorted(
            chain_marginal(run_chain, K1, K2, trials=trials)[0] for _ in range(reps)
        )
        return runs[len(runs) // 2] * 1000.0

    cap = 25088
    pts0 = io.read_points("/root/reference/data/kitti_07_dump/000000/points.bin")
    pts1 = io.read_points("/root/reference/data/kitti_07_dump/000001/points.bin")
    raw_t = make_frame(pts0, capacity=cap)
    raw_s = make_frame(pts1, capacity=cap)

    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    target = preprocess(raw_t)
    source = preprocess(raw_s)
    jax.block_until_ready(source.points)

    _salt = [0]

    def chain_pre(K, fn=preprocess):
        # value-significant per-element salt + full fetch: see the REPLAY
        # HAZARD note in utils/benchtime.py (a 0.0x nudge made every chain
        # element bitwise-identical and relay-replayable)
        out = raw_s
        for _ in range(K):
            _salt[0] += 1
            out = fn(raw_s.replace(
                points=raw_s.points + (_salt[0] * 1e-5 + 1e-6 * out.points[0, 0])
            ))
        float(jnp.sum(out.points))

    emit("preprocess_knn_ms_per_scan", marginal_ms(chain_pre), "ms")

    # fast path: voxel-moments covariance estimation (ops/features.py)
    @jax.jit
    def preprocess_fast(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs_moments(f, leaf=1.0)

    out = preprocess_fast(raw_s)
    jax.block_until_ready(out.points)
    emit("preprocess_ms_per_scan", marginal_ms(lambda K: chain_pre(K, preprocess_fast)), "ms")

    # --- full VGICP pair registration (LM to convergence) -----------------
    # Corrected protocol (round 3): init near the graph.txt ground-truth
    # relative pose (the kitti_07 submaps are ~3 m apart in their own
    # frames; a near-identity init converges into a degenerate 21%-overlap
    # basin — see bench.py docstring). Baseline = measured CPU registration
    # on the same protocol (REF_BASELINE.json cov workload, best thread).
    g = io.load_graph("/root/reference/data/kitti_07_dump/graph.txt")
    T_rel = se3.se3_inverse(se3.pose_from_xyzq(jnp.asarray(g[0]))) @ se3.pose_from_xyzq(
        jnp.asarray(g[1])
    )
    vmap = jax.jit(lambda f: build_voxelmap(f, 1.0))(target)
    graph = FactorGraph(num_poses=1)
    graph.add(make_vgicp_factor(-1, 0, vmap, source, min_voxel_points=4))
    reg = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=10, max_inner_iterations=5)))
    T0_reg = (T_rel @ se3.se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.06, -0.08, 0.05])))[None]
    out = reg(T0_reg)
    jax.block_until_ready(out.poses)
    rot_e, trans_e = se3.pose_error(out.poses[0], T_rel)
    assert float(trans_e) < 0.15, f"suite registration did not converge: {float(trans_e)} m"

    def chain_reg(K):
        p = T0_reg
        for _ in range(K):
            _salt[0] += 1
            p = T0_reg.at[:, :3, 3].add(_salt[0] * 1e-4 + 1e-6 * reg(p).poses[:, :3, 3])
        float(jnp.sum(reg(p).poses))

    ref_reg_ms = 18.918  # REF_BASELINE.json ref_cpu_vgicp_registration_cov_ms, best thread
    ms = marginal_ms(chain_reg, K1=10, K2=40, reps=5)
    emit("vgicp_registration_ms_per_scan", ms, "ms", baseline=ref_reg_ms)
    print(json.dumps({"metric": "vgicp_registration_fps", "value": round(1000.0 / ms, 2),
                      "unit": "frames/s", "vs_baseline": round(ref_reg_ms / ms, 2),
                      "trans_err_vs_gt_m": round(float(trans_e), 4)}), flush=True)

    # --- single-stream LM over SOURCE CLUSTERS (round 5, the latency path:
    # ~5k weighted cluster records per probe/error-eval instead of 25k
    # points; factors/vgicp.VGICPClustersFactor)
    from gtsam_points_tpu.factors import make_vgicp_clusters_factor
    from gtsam_points_tpu.registration import cluster_source as _cluster_source

    clusters_r = jax.jit(lambda s: _cluster_source(s, 1.0, 5632))(source)
    graph_c = FactorGraph(num_poses=1)
    graph_c.add(make_vgicp_clusters_factor(-1, 0, vmap, clusters_r, min_voxel_points=4))
    reg_c = jax.jit(
        lambda p: optimize_lm(graph_c, p, LMParams(max_iterations=10, max_inner_iterations=5))
    )
    out_c = reg_c(T0_reg)
    jax.block_until_ready(out_c.poses)
    rot_c, trans_c = se3.pose_error(out_c.poses[0], T_rel)
    assert float(trans_c) < 0.15, f"cluster LM did not converge: {float(trans_c)} m"

    def chain_reg_c(K):
        p = T0_reg
        for _ in range(K):
            _salt[0] += 1
            p = T0_reg.at[:, :3, 3].add(_salt[0] * 1e-4 + 1e-6 * reg_c(p).poses[:, :3, 3])
        float(jnp.sum(reg_c(p).poses))

    ms_c = marginal_ms(chain_reg_c, K1=10, K2=40, reps=5)
    emit("vgicp_registration_clusters_ms_per_scan", ms_c, "ms", baseline=ref_reg_ms)
    print(json.dumps({
        "metric": "vgicp_registration_clusters_fps",
        "value": round(1000.0 / ms_c, 2), "unit": "frames/s",
        "vs_baseline": round(ref_reg_ms / ms_c, 2),
        "trans_err_vs_gt_m": round(float(trans_c), 4),
    }), flush=True)

    # reference-parity correspondence caching (the reference's
    # correspondence_update_tolerance, impl/integrated_icp_factor_impl.hpp:
    # 128-143): near-converged LM iterations reuse the frozen probe, cutting
    # the per-iteration probe from the latency path
    reg_ct = jax.jit(lambda p: optimize_lm(
        graph_c, p,
        LMParams(max_iterations=10, max_inner_iterations=5,
                 correspondence_update_tolerance_rot=0.01,
                 correspondence_update_tolerance_trans=0.05)))
    out_ct = reg_ct(T0_reg)
    jax.block_until_ready(out_ct.poses)
    rot_ct, trans_ct = se3.pose_error(out_ct.poses[0], T_rel)

    def chain_reg_ct(K):
        p = T0_reg
        for _ in range(K):
            _salt[0] += 1
            p = T0_reg.at[:, :3, 3].add(_salt[0] * 1e-4 + 1e-6 * reg_ct(p).poses[:, :3, 3])
        float(jnp.sum(reg_ct(p).poses))

    ms_ct = marginal_ms(chain_reg_ct, K1=10, K2=40, reps=5)
    print(json.dumps({
        "metric": "vgicp_registration_clusters_corrtol_ms_per_scan",
        "value": round(ms_ct, 4), "unit": "ms",
        "vs_baseline": round(ref_reg_ms / ms_ct, 2),
        "trans_err_vs_gt_m": round(float(trans_ct), 4),
        "note": "correspondence_update_tolerance 0.01 rad / 0.05 m "
        "(reference caching semantics)",
    }), flush=True)

    # --- covariance-path ACCURACY PARITY (VERDICT r4 item 6): the same
    # registration with moments-path covariances must land at the same
    # optimum as the kNN covariances; this row is what justifies the fast
    # preprocess (preprocess_ms_per_scan) as the documented default.
    tgt_m = preprocess_fast(raw_t)
    src_m = preprocess_fast(raw_s)
    vmap_m = jax.jit(lambda f: build_voxelmap(f, 1.0))(tgt_m)
    graph_m = FactorGraph(num_poses=1)
    graph_m.add(make_vgicp_factor(-1, 0, vmap_m, src_m, min_voxel_points=4))
    reg_m = jax.jit(
        lambda p: optimize_lm(graph_m, p, LMParams(max_iterations=10, max_inner_iterations=5))
    )
    out_m = reg_m(T0_reg)
    jax.block_until_ready(out_m.poses)
    rot_m, trans_m = se3.pose_error(out_m.poses[0], T_rel)
    print(json.dumps({
        "metric": "covariance_path_accuracy_parity",
        "trans_err_vs_gt_m_moments": round(float(trans_m), 4),
        "trans_err_vs_gt_m_knn": round(float(trans_e), 4),
        "rot_err_vs_gt_rad_moments": round(float(rot_m), 5),
        "within_reference_bounds": bool(float(trans_m) < 0.15 and float(rot_m) < 0.015),
        "note": "same kitti_07 pair protocol; moments covs = "
        "estimate_normals_covs_moments (the documented default preprocess)",
    }), flush=True)

    # --- odometry step (register + map insert) + phase breakdown ---
    # HONEST protocol (round 4): start every chain from a salted copy of a
    # steady-state odometry state and END with a full-state fetch — the
    # replay hazard (utils/benchtime.py) produced fictitious 0.06 ms/step
    # readings for this section before; physics (an LM running its full 10
    # iterations over 16k points per step) puts the true figure ~9 ms.
    from gtsam_points_tpu.pipelines.odometry import make_odometry_stepper
    from gtsam_points_tpu.ops.voxelmap import insert_frame_incremental
    from gtsam_points_tpu.types.frame import transform_frame
    from gtsam_points_tpu.factors.vgicp import VGICPFactor

    params = OdometryParams(
        voxel_resolution=1.0, map_capacity=131072, min_voxel_points=4.0,
        max_iterations=10, keyframe_trans=1e-9, keyframe_rot=1e-9,  # insert every frame
    )
    noise = se3.se3_exp(jnp.asarray([0.02, -0.02, 0.03, 0.1, -0.08, 0.05]))
    # per-scan preprocessing product (round 5): sensor-frame clusters at the
    # map leaf switch the insert to the cluster-moment path (the per-point
    # insert is bound by the 25k-key sort; clusters sort ~5.6k)
    from gtsam_points_tpu.registration import cluster_source

    clusters_o = jax.jit(lambda s: cluster_source(s, 1.0, 5632))(source)
    stepper = make_odometry_stepper(params)  # donated streaming state
    st_w = init_odometry(target, params)
    for _ in range(5):  # reach steady state; diag fetch forces execution
        st_w, T_w, diag = stepper(st_w, source, noise, clusters_o)
        int(diag["iterations"])
    steady = jax.tree_util.tree_map(lambda x: x + 0, st_w)

    def fresh_state():
        _salt[0] += 1
        s = jax.tree_util.tree_map(lambda x: x + 0, steady)
        return s._replace(T_world=s.T_world.at[0, 3].add(_salt[0] * 1e-6))

    def chain_odo(K):
        st = fresh_state()
        for _ in range(K):
            st, T, _ = stepper(st, source, noise, clusters_o)
        float(jnp.sum(st.vmap.moments)) + float(jnp.sum(T))

    emit("odometry_step_ms_per_scan", marginal_ms(chain_odo, K1=10, K2=50, reps=3), "ms", baseline=30.0)

    # phase breakdown (VERDICT r3 item 8), same salted-fetch protocol
    lmp = LMParams(max_iterations=10, max_inner_iterations=5)
    regj = jax.jit(
        lambda vm, T0: optimize_lm(
            FactorGraph(
                [VGICPFactor(
                    voxelmap=vm, source=source,
                    fixed_target_pose=jnp.eye(4, dtype=jnp.float32),
                    target_key=-1, source_key=0, min_voxel_points=4.0,
                )],
                num_poses=1,
            ),
            T0[None], lmp,
        ).poses[0]
    )
    T_base = regj(steady.vmap, steady.T_world @ noise)

    def chain_reg_odo(K):
        T = T_base
        for _ in range(K):
            _salt[0] += 1
            T = regj(steady.vmap, (T @ noise).at[0, 3].add(_salt[0] * 1e-6))
        float(jnp.sum(T))

    emit("odometry_register_ms_per_scan", marginal_ms(chain_reg_odo), "ms")

    wfb = jax.jit(transform_frame)(steady.T_world, source)
    import functools as _ft

    from gtsam_points_tpu.registration import insert_clusters_incremental

    insj = jax.jit(
        _ft.partial(insert_frame_incremental, scan_cells_capacity=8192),
        donate_argnums=(0,),
    )

    def chain_ins(K):
        _salt[0] += 1
        vm = jax.tree_util.tree_map(lambda x: x + 0, steady.vmap)
        wf_s = wfb.replace(points=wfb.points + _salt[0] * 1e-6)
        for _ in range(K):
            vm, _ov = insj(vm, wf_s)
            wf_s = wf_s.replace(points=wf_s.points + 1e-7)
        float(jnp.sum(vm.moments))

    emit("odometry_insert_ms_per_scan", marginal_ms(chain_ins, K1=10, K2=50, reps=5), "ms")

    # cluster-moment insert (the production path when preprocessing supplies
    # sensor-frame clusters — what odometry_step_ms_per_scan above uses)
    insj_cl = jax.jit(insert_clusters_incremental, donate_argnums=(0,))
    T_w0 = steady.T_world

    def chain_ins_cl(K):
        # the chain's data dependency rides the donated map itself (vm ->
        # insj_cl -> vm); the pose salt must NOT read back from vm — an
        # extra consumer of the donated buffers forces XLA to copy the
        # ~26 MB map every insert instead of updating in place
        _salt[0] += 1
        vm = jax.tree_util.tree_map(lambda x: x + 0, steady.vmap)
        for k in range(K):
            Tw = T_w0.at[0, 3].add(_salt[0] * 1e-6 + k * 1e-7)
            vm, _ov = insj_cl(vm, clusters_o, Tw)
        float(jnp.sum(vm.moments))

    emit("odometry_insert_clusters_ms_per_scan", marginal_ms(chain_ins_cl, K1=10, K2=50, reps=5), "ms")

    # --- config 4: FPFH + RANSAC/GNC global registration (no initial guess) ---
    from gtsam_points_tpu.registration import (
        GNCParams,
        RANSACParams,
        estimate_fpfh,
        estimate_pose_gnc,
        estimate_pose_ransac,
    )

    feats_fn = jax.jit(estimate_fpfh)
    f_t = feats_fn(target)
    f_s = feats_fn(source)
    jax.block_until_ready(f_s)

    def chain_fpfh(K):
        out = f_s
        for _ in range(K):
            out = feats_fn(source)
        jax.block_until_ready(out)

    emit("fpfh_ms_per_scan", marginal_ms(chain_fpfh), "ms")

    ransac_fn = jax.jit(
        lambda: estimate_pose_ransac(target, source, f_t, f_s, RANSACParams(max_iterations=4096))
    )
    res = ransac_fn()
    jax.block_until_ready(res.T_target_source)

    def chain_ransac(K):
        for _ in range(K):
            res = ransac_fn()
        jax.block_until_ready(res.T_target_source)

    emit("ransac_4096hyp_ms", marginal_ms(chain_ransac), "ms")

    gnc_fn = jax.jit(lambda: estimate_pose_gnc(target, source, f_t, f_s, GNCParams()))
    res = gnc_fn()
    jax.block_until_ready(res.T_target_source)

    def chain_gnc(K):
        for _ in range(K):
            res = gnc_fn()
        jax.block_until_ready(res.T_target_source)

    emit("gnc_ms", marginal_ms(chain_gnc), "ms")

    # --- config 5 (single-chip): kitti_07 5-submap SLAM = odometry + FPFH/GNC
    # loop closure + batched pose-graph refinement (examples/kitti07_slam.py
    # runs the same pipeline with reporting; bench_scaling.py shards it) ---
    import numpy as np

    from gtsam_points_tpu.factors import BetweenFactor, PriorFactor, make_gicp_factor

    gt = io.load_graph("/root/reference/data/kitti_07_dump/graph.txt")
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))
    frames = []
    for i in range(5):
        pts = io.read_points(f"/root/reference/data/kitti_07_dump/{i:06d}/points.bin")
        frames.append(preprocess_fast(make_frame(pts, capacity=cap)))
    jax.block_until_ready(frames[-1].points)

    # per-step pose predictions: GT + noise (the reference protocol,
    # test_matching_cost_factors.cpp:42-61 — the submaps are ~15 m apart,
    # far outside any identity-init basin; a real stream would use the
    # constant-velocity prediction the odometry pipeline provides)
    rng5 = np.random.RandomState(42)
    preds = [
        jnp.asarray(np.linalg.inv(T_gt[i - 1]) @ T_gt[i] @ np.asarray(
            se3.se3_exp(jnp.asarray(rng5.uniform(-0.1, 0.1, 6).astype(np.float32)))
        ))
        for i in range(1, 5)
    ]
    ft0, ft4 = feats_fn(frames[0]), feats_fn(frames[4])
    gnc_lc = jax.jit(lambda: estimate_pose_gnc(frames[0], frames[4], ft0, ft4, GNCParams()))

    graph5 = FactorGraph(num_poses=5)
    graph5.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    for i in range(4):
        graph5.add(make_gicp_factor(i, i + 1, frames[i], frames[i + 1], max_corr_dist=2.0, grid_leaf=1.0))
    graph5.add(make_gicp_factor(0, 4, frames[0], frames[4], max_corr_dist=2.0, grid_leaf=1.0))
    # pose-graph refinement starts near the optimum (odometry output), so the
    # movement-gated correspondence cache skips most kNN probes
    pg_fn = jax.jit(
        lambda p: optimize_lm(
            graph5,
            p,
            LMParams(
                max_iterations=10,
                correspondence_update_tolerance_rot=0.02,
                correspondence_update_tolerance_trans=0.1,
            ),
        )
    )

    def slam_once():
        params5 = OdometryParams(
            voxel_resolution=1.0, map_capacity=131072, min_voxel_points=4.0,
            max_iterations=10, keyframe_trans=0.1, keyframe_rot=0.05,
        )
        st = init_odometry(frames[0], params5)
        poses = [jnp.eye(4)]
        for f, pred in zip(frames[1:], preds):
            st, T, _ = odometry_step(st, f, params5, pred)
            poses.append(T)
        lc = gnc_lc()
        res = pg_fn(jnp.stack(poses))
        return res.poses

    out = slam_once()
    jax.block_until_ready(out)

    def chain_slam(K):
        for _ in range(K):
            out = slam_once()
        jax.block_until_ready(out)

    ms_total = marginal_ms(chain_slam, K1=1, K2=4, trials=3)
    # note: slam_once is host-interactive (per-scan program dispatches whose
    # internal syncs cannot be chained away), so unlike the pure-device
    # metrics this one still carries tunnel round-trip costs per scan.
    emit("slam_pipeline_ms_per_scan", ms_total / 5, "ms", baseline=30.0)
    # --- incremental optimizer: steady-state per-update latency (bounded
    # window + stable jit cache; VERDICT r1 item 1). Host-driven by nature,
    # so this is honest wall time per update after warmup. ---
    from gtsam_points_tpu.factors import BetweenFactor as _BF
    from gtsam_points_tpu.optim.isam2 import ISAM2Ext
    from gtsam_points_tpu.optim.lm import LMParams as _LMP

    isam = ISAM2Ext(window_size=4, lm_params=_LMP(max_iterations=5))
    w6 = jnp.ones(6) * 100.0
    d = np.asarray(se3.se3_exp(jnp.asarray([0.01, 0.0, 0.02, 1.0, 0.05, 0.0], dtype=jnp.float32)))
    Ts = [np.eye(4, dtype=np.float32)]
    isam.update([PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0)], {0: jnp.eye(4)})
    upd_ms = []
    for i in range(1, 40):
        Ts.append(Ts[-1] @ d)
        r = isam.update(
            [_BF(measured=jnp.asarray(d), weights=w6, target_key=i - 1, source_key=i)],
            {i: jnp.asarray(Ts[i])},
        )
        upd_ms.append(r.elapsed_time * 1000.0)
    steady = sorted(upd_ms[10:])[len(upd_ms[10:]) // 2]
    # host-driven by design (each update syncs its optimize result back);
    # on the tunneled dev TPU every sync of a loopy program costs ~24 ms, so
    # this reading is dominated by tunnel round trips, not device compute.
    emit("isam2_update_ms_steady_state", steady, "ms")
    print(json.dumps({"metric": "isam2_compiles_after_warmup", "value": isam.num_compiles,
                      "unit": "programs", "note": "flat across updates 7..39"}), flush=True)

    # --- long-session steady-state: isam2 update at 200 poses (VERDICT r3
    # item 3) — synthetic ring sequence (utils/synthetic.py), VGICP odometry
    # factors, window 4; mean of the last 20 updates ---
    from gtsam_points_tpu.utils.synthetic import ring_scans, ring_trajectory, ring_world
    from gtsam_points_tpu.optim.isam2 import ISAM2Ext
    from gtsam_points_tpu.factors import PriorFactor

    world = ring_world()
    T_true_r = ring_trajectory(200, 100)
    scans_r = ring_scans(world, T_true_r, 2048)
    frames_r = [make_frame(s, capacity=2048) for s in scans_r]
    isam_r = ISAM2Ext(window_size=4, lm_params=LMParams(max_iterations=8))
    isam_r.update(
        [PriorFactor(prior=jnp.asarray(T_true_r[0]), weights=jnp.full((6,), 1e6), key=0)],
        {0: jnp.asarray(T_true_r[0])},
    )
    upd_ms = []
    for i in range(1, 200):
        d_true = np.linalg.inv(T_true_r[i - 1]) @ T_true_r[i]
        init_r = isam_r.calculate_estimate_pose(i - 1) @ d_true
        t0 = time.perf_counter()
        isam_r.update(
            [make_vgicp_factor(i - 1, i, frames_r[i - 1], frames_r[i],
                               voxel_resolution=0.25, min_voxel_points=1)],
            {i: jnp.asarray(init_r)},
        )
        upd_ms.append((time.perf_counter() - t0) * 1000.0)
    emit("isam2_update_ms_at_200_poses", float(np.mean(upd_ms[-20:])), "ms")
    emit("isam2_update_ms_at_50_poses", float(np.mean(upd_ms[45:65])), "ms")


    # accuracy vs bundled GT (gauge-aligned at pose 0)
    T0 = np.asarray(out[0])
    rel_est = [np.linalg.inv(T0) @ np.asarray(out[i]) for i in range(5)]
    rel_gt = [np.linalg.inv(T_gt[0]) @ T_gt[i] for i in range(5)]
    errs = [
        se3.pose_error(jnp.asarray(a, dtype=jnp.float32), jnp.asarray(b, dtype=jnp.float32))
        for a, b in zip(rel_gt, rel_est)
    ]
    emit("slam_pipeline_max_trans_err", float(max(float(t) for _, t in errs)), "m")
    emit("slam_pipeline_max_rot_err", float(max(float(r) for r, _ in errs)), "rad")

    # --- sequence-level odometry + ATE (VERDICT r1 item 6) ---------------
    # (a) kitti_07: scan-to-map VGICP odometry over all 5 submaps
    def run_sequence(frames_seq, preds_seq, params_seq):
        st = init_odometry(frames_seq[0], params_seq)
        poses = [np.eye(4, dtype=np.float32)]
        per_scan_ms = []
        for f, pred in zip(frames_seq[1:], preds_seq):
            t0 = time.perf_counter()
            st, T, _ = odometry_step(st, f, params_seq, pred)
            jax.block_until_ready(T)
            per_scan_ms.append((time.perf_counter() - t0) * 1000)
            poses.append(np.asarray(T))
        return poses, per_scan_ms

    def ate_stats(poses, T_gt_seq):
        delta = T_gt_seq[0] @ np.linalg.inv(poses[0])
        sq = []
        for i in range(len(T_gt_seq)):
            T_err = np.linalg.inv(T_gt_seq[i]) @ (delta @ poses[i])
            xi = np.asarray(se3.se3_log(jnp.asarray(T_err[None], dtype=jnp.float32))[0])
            sq.append(float(np.sum(xi[3:] ** 2)))
        return float(np.sqrt(np.mean(sq)))

    params_k = OdometryParams(
        voxel_resolution=1.0, map_capacity=131072, min_voxel_points=4.0,
        max_iterations=30, keyframe_trans=0.1, keyframe_rot=0.05,
    )
    rngk = np.random.RandomState(42)
    preds_k = [
        jnp.asarray(np.linalg.inv(T_gt[i - 1]) @ T_gt[i] @ np.asarray(
            se3.se3_exp(jnp.asarray(rngk.uniform(-0.1, 0.1, 6).astype(np.float32)))))
        for i in range(1, 5)
    ]
    poses_k, ms_k = run_sequence(frames, preds_k, params_k)
    poses_k2, ms_k = run_sequence(frames, preds_k, params_k)  # warm (compile excluded)
    emit("kitti07_odometry_ms_per_scan_p50", float(np.median(ms_k)), "ms")
    emit("kitti07_odometry_ms_per_scan_max", float(np.max(ms_k)), "ms")
    emit("kitti07_odometry_ate_rmse", ate_stats(poses_k2, T_gt), "m")

    # (b) newer_01: merged edge+plane clouds, identity predictions
    gt_n = io.load_graph("/root/reference/data/newer_01/graph.txt")
    T_gt_n = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt_n)))[:5]
    frames_n = []
    for i in range(5):
        e = io.read_points(f"/root/reference/data/newer_01/edges_{i * 10:06d}.bin")
        p = io.read_points(f"/root/reference/data/newer_01/planes_{i * 10:06d}.bin")
        fr = make_frame(np.concatenate([e, p]), capacity=131072)
        frames_n.append(jax.jit(lambda x: voxelgrid_sampling(x, 0.25, capacity=32768))(fr))
    params_n = OdometryParams(
        voxel_resolution=1.0, map_capacity=131072, min_voxel_points=4.0,
        max_iterations=15, keyframe_trans=1e-9, keyframe_rot=1e-9,
    )
    eye_preds = [jnp.eye(4)] * 4
    poses_n, ms_n = run_sequence(frames_n, eye_preds, params_n)
    poses_n2, ms_n = run_sequence(frames_n, eye_preds, params_n)
    emit("newer01_odometry_ms_per_scan_p50", float(np.median(ms_n)), "ms")
    emit("newer01_odometry_ate_rmse", ate_stats(poses_n2, T_gt_n), "m")

    # --- batched-registration throughput sweep (VERDICT r1 item 7):
    # B concurrent VGICP registrations as ONE vmapped program, B = 1..16 ---
    from gtsam_points_tpu.ops import planar
    from gtsam_points_tpu.ops.voxelmap import lookup_fetch_planar

    vmap_t = jax.jit(lambda f: build_voxelmap(f, 0.5))(target)
    pts_p = source.points.T
    smask = source.mask
    GN_ITERS = 8

    def gn_register(T0):
        def body(i, T):
            pm = planar.transform(T, pts_p)
            found, cnt, mu, C6 = lookup_fetch_planar(vmap_t, pm, smask)
            found = found & (cnt >= 3.0)
            eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], C6.dtype) * 1e-3
            W6 = planar.sym_inv(C6 + eye6[:, None])
            lin = planar.linearize_point_system(pts_p, pm, pm - mu, W6, found, T[:3, :3])
            from gtsam_points_tpu.utils.solve6 import solve6

            H = lin.H_ss + 1e-6 * jnp.eye(6)
            xi = solve6(H, lin.b_s)
            return T @ se3.se3_exp(xi)

        return jax.lax.fori_loop(0, GN_ITERS, body, T0)

    rngb = np.random.RandomState(0)
    for B in (1, 2, 4, 8, 16, 64):
        fn = jax.jit(jax.vmap(gn_register))
        T0s = jax.vmap(se3.se3_exp)(jnp.asarray(rngb.uniform(-0.1, 0.1, (B, 6)).astype(np.float32)))
        out = fn(T0s)
        jax.block_until_ready(out)

        # salted data-dependent chains + marginal differencing (REPLAY
        # HAZARD, utils/benchtime.py — this row previously re-dispatched
        # bitwise-identical inputs, and a raw salted loop pays a large
        # per-distinct-dispatch tunnel cost that the marginal removes)
        def chain_b(K, fn=fn, T0s=T0s):
            cur = T0s
            for _ in range(K):
                _salt[0] += 1
                cur = fn(T0s.at[:, :3, 3].add(_salt[0] * 1e-4 + 1e-9 * cur[:, :3, 3]))
            float(jnp.sum(cur))

        s = chain_marginal(chain_b, 4, 12, trials=3)[0]
        print(
            json.dumps(
                {
                    "metric": f"batched_registration_B{B}_frames_per_s",
                    "value": round(B / s, 2),
                    "unit": "frames/s/chip",
                    "batch": B,
                    "note": "FULL-RESOLUTION single-level GN scaling curve "
                    "(25k-point probes, leaf 0.5; shape-of-curve row, raw "
                    "sync-inclusive). The production batched path is the "
                    "source-cluster pyramid — see bench.py headline.",
                }
            ),
            flush=True,
        )

    # --- GICP mahalanobis cache-mode evidence (VERDICT r2 item 8) ---------
    # The reference offers FULL / COMPACT (6-float f32) / NONE cache modes
    # (integrated_gicp_factor.hpp:20, util/compact.hpp:9-26); this framework
    # ships one mode: W6 precomputed per correspondence refresh, frozen
    # through LM inner iterations (= COMPACT in layout, FULL in lifetime),
    # with recompute happening only at correspondence updates. These two rows
    # measure both extremes on-device to justify the single-mode design, and
    # assert the modes agree at the linearization point (the acceptance of
    # test_compact_mahalanobis.cpp:118-160).
    from gtsam_points_tpu.factors import make_gicp_factor as _mgf

    gfac = _mgf(-1, 0, target, source, max_corr_dist=2.0)
    poses_g = jnp.eye(4)[None]
    corr_frozen = jax.jit(gfac.correspondences)(poses_g)
    jax.block_until_ready(corr_frozen)

    @jax.jit
    def chainable_cached(poses):
        lin, _ = gfac.linearize_corr(poses, corr_frozen)
        return poses.at[0, :3, 3].add(1e-12 * lin.b_s[:3]), lin.error

    @jax.jit
    def chainable_recompute(poses):
        lin = gfac.linearize(poses)
        return poses.at[0, :3, 3].add(1e-12 * lin.b_s[:3]), lin.error

    def make_gchain(step):
        def chain(K):
            p = poses_g
            for _ in range(K):
                p, e = step(p)
            jax.block_until_ready(e)

        return chain

    cached_ms = marginal_ms(make_gchain(chainable_cached))
    recompute_ms = marginal_ms(make_gchain(chainable_recompute))
    l_a = jax.jit(lambda p: gfac.linearize_corr(p, corr_frozen)[0])(poses_g)
    l_b = jax.jit(gfac.linearize)(poses_g)
    h_rel = float(
        jnp.max(jnp.abs(l_a.H_ss - l_b.H_ss)) / (jnp.max(jnp.abs(l_b.H_ss)) + 1e-12)
    )
    emit("gicp_linearize_cached_w6_ms", cached_ms, "ms")
    emit("gicp_linearize_recompute_ms", recompute_ms, "ms")
    print(
        json.dumps(
            {
                "metric": "gicp_cache_mode_equivalence",
                "value": h_rel,
                "unit": "max rel H diff at linearization point",
                "recompute_over_cached": round(recompute_ms / max(cached_ms, 1e-9), 2),
                "note": "recompute cost is the kNN probe + fused-cov inverse; the "
                "cached path is what LM inner iterations run",
            }
        ),
        flush=True,
    )
    print(json.dumps({"metric": "tunnel_dispatch_ms_at_end",
                      "value": round(tunnel_probe_ms(), 4), "unit": "ms"}), flush=True)


if __name__ == "__main__":
    main()
