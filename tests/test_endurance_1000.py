"""1000-pose COMPOSED endurance session (VERDICT r4 item 3): ONE loop drives
ISAM2Ext (window marginalization = the fixed-lag mechanism) + the
sharded/LRU voxel map + OffloadPool keyframe spill TOGETHER over 1000 poses
with 9 loop closures (8 one-lap revisits + one 9-laps-late closure), the
role the reference's ISAM2Ext/fixed-lag pair plays under an unbounded glim
session (/root/reference/src/gtsam_points/optimizers/isam2_ext.cpp:425-520,
include/gtsam_points/optimizers/incremental_fixed_lag_smoother_ext.hpp:44).

Per pose i the SAME loop:
  1. touches frames i-1, i in the OffloadPool (reloading spilled keyframes),
  2. runs the ISAM2Ext odometry update (VGICP matching factor, window=4 so
     pose i-4 is marginalized every step),
  3. on closure poses, fetches the OLD keyframe j from the pool (by then
     host-resident) and updates with a late loop factor -> global relax,
  4. inserts every 4th scan into the capacity-bounded sharded voxel map at
     the CURRENT estimate.

Asserts the unbounded-session invariants: ATE within the reference bounds,
compiles bounded after warm-up (power-of-two relax buckets), per-update
time FLAT over 1000 poses, device arrays bounded, pool device usage within
budget with real spills AND reloads. Publishes isam2_update_ms_at_1000 to
ENDURANCE.json at the repo root.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import PriorFactor, make_vgicp_factor
from gtsam_points_tpu.optim.isam2 import ISAM2Ext
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.offload import OffloadPool
from gtsam_points_tpu.utils.synthetic import ring_scans, ring_trajectory, ring_world

ROT_TOL = 0.015  # reference bounds, test_matching_cost_factors.cpp:227-228
TRANS_TOL = 0.15

N_POSES = 1000
LAP = 100  # 10 laps over the same ring; every lap revisits lap-1 geometry
SCAN_N = 2048  # the regime whose ~1.3 mm/step odometry bias is characterized
# (test_long_sequence_stress.py docstring); 1024-point scans drift ~2x worse

# one closure per lap, each anchored BACK TO LAP 1 (j = i mod 100) at a
# different ring angle — chaining closures lap-to-lap lets global drift grow
# linearly across laps (each anchor is itself drifted); every closure is
# 1-9 laps late: >= 5 late closures (r4 item 3)
LOOPS = {150: 50, 260: 60, 370: 70, 480: 80, 590: 90,
         640: 40, 750: 50, 860: 60, 970: 70}


def _ate(T_true, est_list):
    gauge = T_true[0] @ np.linalg.inv(np.asarray(est_list[0]))
    rots, trans = [], []
    for Tt, Te in zip(T_true, est_list):
        T_err = np.linalg.inv(Tt) @ (gauge @ np.asarray(Te))
        xi = np.asarray(se3.se3_log(jnp.asarray(T_err[None].astype(np.float32)))[0])
        rots.append(np.linalg.norm(xi[:3]))
        trans.append(np.linalg.norm(xi[3:]))
    return float(np.max(rots)), float(np.max(trans))


def test_endurance_1000_poses_composed():
    from gtsam_points_tpu.parallel import (
        build_sharded_voxelmap, sharded_insert_frame, sharded_num_voxels)

    world = ring_world(0, 24000)
    T_true = ring_trajectory(N_POSES, LAP)
    scans = ring_scans(world, T_true, SCAN_N, noise=0.005, seed=1)

    # keyframe pool: budget ~64 frames of the ~1000 -> steady-state spill
    frame0 = make_frame(scans[0], capacity=SCAN_N)
    frame_bytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(frame0))
    pool = OffloadPool(device_budget_bytes=64 * frame_bytes)
    pool.put("f0", frame0)

    isam = ISAM2Ext(window_size=4, lm_params=LMParams(max_iterations=6))
    isam.update(
        [PriorFactor(prior=jnp.asarray(T_true[0]), weights=jnp.full((6,), 1e6), key=0)],
        {0: jnp.asarray(T_true[0])},
    )

    svmap = build_sharded_voxelmap(
        make_frame((scans[0] @ T_true[0][:3, :3].T) + T_true[0][:3, 3], capacity=SCAN_N),
        1.0, num_shards=8, capacity_per_shard=8192,
    )
    insert = jax.jit(sharded_insert_frame)

    update_ms = []
    compiles_at = {}
    live_at = {}
    n_relaxes = 0
    reloads = 0
    for i in range(1, N_POSES):
        pool.put(f"f{i}", make_frame(scans[i], capacity=SCAN_N))
        d_true = np.linalg.inv(T_true[i - 1]) @ T_true[i]
        init = isam.calculate_estimate_pose(i - 1) @ d_true
        t0 = time.perf_counter()
        fa, fb = pool.touch(f"f{i-1}"), pool.touch(f"f{i}")
        isam.update(
            [make_vgicp_factor(i - 1, i, fa, fb,
                               voxel_resolution=0.25, min_voxel_points=1)],
            {i: jnp.asarray(init)},
        )
        if i in LOOPS:
            j = LOOPS[i]
            assert j in isam.frozen, f"pose {j} not frozen at step {i}"
            was_offloaded = not pool.loaded_on_device(f"f{j}")
            fj = pool.touch(f"f{j}")  # reload the spilled old keyframe
            reloads += int(was_offloaded)
            res = isam.update(
                [make_vgicp_factor(j, i, fj, fb,
                                   voxel_resolution=0.25, min_voxel_points=1)]
            )
            n_relaxes += res.num_loop_closures
        update_ms.append((time.perf_counter() - t0) * 1000.0)
        if i % 4 == 0:
            Te = np.asarray(isam.calculate_estimate_pose(i))
            w = (scans[i] @ Te[:3, :3].T) + Te[:3, 3]
            svmap, _overflow = insert(svmap, make_frame(w, capacity=SCAN_N))
        if i in (200, 400, 999):
            compiles_at[i] = isam.num_compiles
            live_at[i] = len(jax.live_arrays())

    assert n_relaxes == len(LOOPS)

    # 1) accuracy over the full 1000-pose trajectory
    est = [isam.calculate_estimate_pose(i) for i in range(N_POSES)]
    max_rot, max_trans = _ate(T_true, est)
    assert max_rot < ROT_TOL, f"rot ATE {max_rot}"
    assert max_trans < TRANS_TOL, f"trans ATE {max_trans}"

    # 2) compiles bounded: the steady-state update reuses cached programs;
    # relaxes hit power-of-two (P, E, Q) buckets, so the 6 closures after
    # pose 400 may add at most a couple of bucket programs
    extra = compiles_at[999] - compiles_at[400]
    assert extra <= 12, f"{extra} compiles after pose 400 (cache leak?)"

    # 3) per-update time FLAT over 5x the round-4 horizon (closure poses
    # excluded: the relax is O(P+E) by design and runs 9 times total)
    plain = [m for k, m in enumerate(update_ms, start=1) if k not in LOOPS]
    early = float(np.mean(plain[100:200]))
    late = float(np.mean(plain[-100:]))
    assert late < 2.0 * early, f"update time grew {early:.1f} -> {late:.1f} ms"

    # 4) no per-pose device-array leak
    assert live_at[999] - live_at[400] < 3000, (live_at[400], live_at[999])

    # 5) offload pool really spilled and reloaded under budget
    assert pool.memory_usage_device() <= pool.budget
    n_off = sum(0 if pool.loaded_on_device(n) else 1 for n in pool.names())
    assert n_off > 800, f"only {n_off} frames spilled"
    assert reloads >= 5, f"only {reloads} closure keyframes came back from host"

    # 6) sharded map stayed within its fixed capacity while mapping the ring
    nv = int(sharded_num_voxels(svmap))
    assert nv <= 8 * 8192
    assert nv > 3000

    out = {
        "poses": N_POSES,
        "loop_closures": len(LOOPS),
        "isam2_update_ms_at_1000": round(late, 2),
        "isam2_update_ms_early": round(early, 2),
        "ate_rot_rad": round(max_rot, 5),
        "ate_trans_m": round(max_trans, 4),
        "compiles_total": compiles_at[999],
        "compiles_after_pose_400": extra,
        "frames_spilled_to_host": n_off,
        "closure_keyframes_reloaded": reloads,
        "sharded_map_voxels": nv,
        "host": "cpu (tests/conftest.py forces the 8-virtual-device CPU mesh)",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "ENDURANCE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
