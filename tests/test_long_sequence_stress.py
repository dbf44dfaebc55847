"""Long-sequence SLAM stress (VERDICT r3 item 3): 200 poses, 3 LATE loop
closures, driven pose-by-pose through ISAM2Ext with VGICP matching factors,
plus a FixedLagSmoother leg and a capacity-bounded sharded voxel map
accumulating every scan. Asserts the properties that make an unbounded
session viable (the role ISAM2Ext plays under glim,
/root/reference/src/gtsam_points/optimizers/isam2_ext.cpp:425-520):

- trajectory ATE within the reference accuracy bounds after the relaxes,
- jit compiles BOUNDED after warm-up (program cache keyed by shapes, not
  by pose count — a few extra compiles per distinct relax size only),
- per-update wall time FLAT over the sequence (no O(history) term in the
  steady-state update),
- device-array count bounded (no per-pose buffer leak).

World: a ring corridor (two concentric cylinder walls + floor + pillars)
observed from a circular trajectory traversed twice, so second-lap poses
revisit first-lap geometry and the loop closures are geometrically real.
Odometry uses leaf-0.25 scan-to-scan VGICP: coarser leaves carry a
measurable tangential voxel-discretization bias on this geometry (1.0:
~7 cm/step, 0.5: ~1.5 cm/step, 0.25: ~1.3 mm/step — scan-boundary voxels
pull along the travel direction), and a 200-step dead-reckoned chain
amplifies any bias linearly.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import BetweenFactor, PriorFactor, make_vgicp_factor
from gtsam_points_tpu.optim.isam2 import ISAM2Ext
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3

ROT_TOL = 0.015  # reference bounds, test_matching_cost_factors.cpp:227-228
TRANS_TOL = 0.15

N_POSES = 200
LAP = 100  # poses per lap; lap 2 revisits lap 1
SCAN_N = 2048


from gtsam_points_tpu.utils.synthetic import ring_scans, ring_trajectory, ring_world


def _world(seed=0, n=24000):
    return ring_world(seed, n)


def _trajectory():
    return ring_trajectory(N_POSES, LAP)


def _scans(world, T_true, seed=1):
    return ring_scans(world, T_true, SCAN_N, noise=0.005, seed=seed)


@pytest.fixture(scope="module")
def sequence():
    world = _world()
    T_true = _trajectory()
    scans = _scans(world, T_true)
    frames = None  # built lazily per test (different capacities not needed)
    return world, T_true, scans


def _ate(T_true, est_list):
    gauge = T_true[0] @ np.linalg.inv(np.asarray(est_list[0]))
    rots, trans = [], []
    for Tt, Te in zip(T_true, est_list):
        T_err = np.linalg.inv(Tt) @ (gauge @ np.asarray(Te))
        xi = np.asarray(se3.se3_log(jnp.asarray(T_err[None].astype(np.float32)))[0])
        rots.append(np.linalg.norm(xi[:3]))
        trans.append(np.linalg.norm(xi[3:]))
    return float(np.max(rots)), float(np.max(trans))


def test_isam2_200_poses_three_late_loop_closures(sequence):
    world, T_true, scans = sequence
    frames = [make_frame(s, capacity=SCAN_N) for s in scans]

    isam = ISAM2Ext(window_size=4, lm_params=LMParams(max_iterations=8))
    isam.update(
        [PriorFactor(prior=jnp.asarray(T_true[0]), weights=jnp.full((6,), 1e6), key=0)],
        {0: jnp.asarray(T_true[0])},
    )

    update_ms = []
    compiles_at = {}
    live_at = {}
    loop_specs = {110: 10, 150: 50, 199: 99}  # i -> frozen revisited pose
    n_relaxes = 0
    for i in range(1, N_POSES):
        d_true = np.linalg.inv(T_true[i - 1]) @ T_true[i]
        init = isam.calculate_estimate_pose(i - 1) @ d_true
        factors = [
            make_vgicp_factor(
                i - 1, i, frames[i - 1], frames[i],
                voxel_resolution=0.25, min_voxel_points=1,
            )
        ]
        t0 = time.perf_counter()
        isam.update(factors, {i: jnp.asarray(init)})
        if i in loop_specs:
            j = loop_specs[i]
            assert j in isam.frozen, f"pose {j} not frozen at step {i}"
            res = isam.update(
                [
                    make_vgicp_factor(
                        j, i, frames[j], frames[i],
                        voxel_resolution=0.25, min_voxel_points=1,
                    )
                ]
            )
            n_relaxes += res.num_loop_closures
        update_ms.append((time.perf_counter() - t0) * 1000.0)
        if i in (30, 60, 199):
            compiles_at[i] = isam.num_compiles
            live_at[i] = len(jax.live_arrays())

    assert n_relaxes == 3

    # 1) accuracy: full 200-pose trajectory within reference bounds
    est = [isam.calculate_estimate_pose(i) for i in range(N_POSES)]
    max_rot, max_trans = _ate(T_true, est)
    assert max_rot < ROT_TOL, f"rot ATE {max_rot}"
    assert max_trans < TRANS_TOL, f"trans ATE {max_trans}"

    # 2) compiles bounded after warm-up: the steady-state odometry update
    # reuses cached programs; only the 2 later relaxes (distinct padded
    # pose-graph sizes) and the marginalization ladder may add a handful
    extra = compiles_at[199] - compiles_at[60]
    assert extra <= 12, f"{extra} compiles after pose 60 (cache leak?)"

    # 3) per-update time flat: steady-state mean late vs early within 2.5x
    # (loop-closure updates excluded — the relax is O(P+E) by design)
    plain = [m for k, m in enumerate(update_ms, start=1) if k not in loop_specs]
    early = float(np.mean(plain[20:40]))
    late = float(np.mean(plain[-20:]))
    assert late < 2.5 * early, f"update time grew {early:.1f} -> {late:.1f} ms"

    # 4) no per-pose device-array leak
    assert live_at[199] - live_at[60] < 2000, (live_at[60], live_at[199])


def test_fixed_lag_smoother_100_poses_flat(sequence):
    from gtsam_points_tpu.optim.incremental import FixedLagSmoother

    world, T_true, scans = sequence
    frames = [make_frame(s, capacity=SCAN_N) for s in scans]
    n = 100

    sm = FixedLagSmoother(lag=3.0, lm_params=LMParams(max_iterations=8))
    sm.update(
        0, 0.0, jnp.asarray(T_true[0]),
        [PriorFactor(prior=jnp.asarray(T_true[0]), weights=jnp.full((6,), 1e6), key=0)],
    )
    update_ms = []
    for i in range(1, n):
        d_true = np.linalg.inv(T_true[i - 1]) @ T_true[i]
        init = np.asarray(sm.estimate(i - 1)) @ d_true
        t0 = time.perf_counter()
        sm.update(
            i, float(i), jnp.asarray(init),
            [
                make_vgicp_factor(
                    i - 1, i, frames[i - 1], frames[i],
                    voxel_resolution=0.25, min_voxel_points=1,
                )
            ],
        )
        update_ms.append((time.perf_counter() - t0) * 1000.0)

    # in-lag estimates track ground truth relative motion
    d_est = np.linalg.inv(np.asarray(sm.estimate(n - 2))) @ np.asarray(
        sm.estimate(n - 1)
    )
    d_true = np.linalg.inv(T_true[n - 2]) @ T_true[n - 1]
    T_err = np.linalg.inv(d_true) @ d_est
    xi = np.asarray(se3.se3_log(jnp.asarray(T_err[None].astype(np.float32)))[0])
    assert np.linalg.norm(xi[:3]) < ROT_TOL and np.linalg.norm(xi[3:]) < TRANS_TOL

    early = float(np.mean(update_ms[20:40]))
    late = float(np.mean(update_ms[-20:]))
    assert late < 2.5 * early, f"smoother update grew {early:.1f} -> {late:.1f} ms"


def test_sharded_map_accumulates_sequence_bounded(sequence):
    """The sharded voxel map ingests every scan of the 200-pose session at
    fixed capacity — the unbounded-map-in-bounded-memory axis (reference
    analogue: iVox LRU eviction, incremental_voxelmap_impl.hpp:49-62)."""
    from gtsam_points_tpu.parallel import (
        build_sharded_voxelmap, sharded_insert_frame, sharded_num_voxels)

    world, T_true, scans = sequence
    cap_per_shard = 8192
    world0 = (scans[0] @ T_true[0][:3, :3].T) + T_true[0][:3, 3]
    svmap = build_sharded_voxelmap(
        make_frame(world0, capacity=SCAN_N), 1.0,
        num_shards=8, capacity_per_shard=cap_per_shard,
    )
    insert = jax.jit(sharded_insert_frame)
    total_overflow = 0
    for i in range(1, N_POSES, 4):  # every 4th scan: 50 inserts
        w = (scans[i] @ T_true[i][:3, :3].T) + T_true[i][:3, 3]
        svmap, overflow = insert(svmap, make_frame(w, capacity=SCAN_N))
        total_overflow += int(overflow)
    nv = int(sharded_num_voxels(svmap))
    assert nv <= 8 * cap_per_shard
    assert nv > 3000  # the ring actually got mapped
    assert total_overflow == 0
