"""Fixed-lag smoother + marginalization tests (reference pattern:
incremental insertion holds the same accuracy bounds as batch,
src/test/test_matching_cost_factors.cpp test_graph_isam2)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.factors import BetweenFactor, PriorFactor
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.incremental import (
    FixedLagSmoother,
    make_marginal_prior,
    marginalize_system,
)
from gtsam_points_tpu.utils import se3


def odom_chain(n, seed=0):
    rng = np.random.RandomState(seed)
    deltas = []
    for _ in range(n - 1):
        xi = np.array([0.02, 0.0, 0.05, 1.0, 0.1, 0.0], dtype=np.float32)
        deltas.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    T = [np.eye(4, dtype=np.float32)]
    for d in deltas:
        T.append(T[-1] @ d)
    return np.stack(T), deltas


def test_marginalization_preserves_information():
    """Marginalizing pose 0 out of a chain leaves the same solution for the rest."""
    T_gt, deltas = odom_chain(4)
    w = jnp.ones(6) * 100.0
    graph = FactorGraph(num_poses=4)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    for i, d in enumerate(deltas):
        graph.add(BetweenFactor(measured=jnp.asarray(d), weights=w, target_key=i, source_key=i + 1))

    rng = np.random.RandomState(1)
    noise = jnp.asarray(rng.randn(4, 6).astype(np.float32) * 0.05)
    poses0 = jnp.asarray(T_gt) @ se3.se3_exp(noise)
    full = optimize_lm(graph, poses0)

    # marginalize pose 0 at the full solution
    A, b, _ = graph.linearize_full(full.poses)
    marg_prior = make_marginal_prior(A, b, full.poses, marg=[0], keep=[1])
    graph2 = FactorGraph(num_poses=4)
    graph2.add(marg_prior)
    for i, d in list(enumerate(deltas))[1:]:
        graph2.add(BetweenFactor(measured=jnp.asarray(d), weights=w, target_key=i, source_key=i + 1))
    # re-solve from perturbed start; poses 1..3 must match the full solution
    noise2 = jnp.asarray(rng.randn(4, 6).astype(np.float32) * 0.03)
    res2 = optimize_lm(graph2, full.poses @ se3.se3_exp(noise2))
    for i in range(1, 4):
        rot_e, trans_e = se3.pose_error(full.poses[i], res2.poses[i])
        assert float(rot_e) < 2e-3 and float(trans_e) < 2e-2, (i, float(rot_e), float(trans_e))


def test_fixed_lag_smoother_chain():
    """Sliding-window smoothing of an odometry chain stays near GT and
    marginalizes old poses without drift blowup."""
    n = 8
    T_gt, deltas = odom_chain(n)
    w = jnp.ones(6) * 100.0
    smoother = FixedLagSmoother(lag=2.5, max_poses=n)
    smoother.update(0, 0.0, jnp.eye(4), [PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0)])
    rng = np.random.RandomState(2)
    for i in range(1, n):
        init = jnp.asarray(T_gt[i]) @ se3.se3_exp(jnp.asarray(rng.randn(6).astype(np.float32) * 0.05))
        smoother.update(
            i,
            float(i),
            init,
            [BetweenFactor(measured=jnp.asarray(deltas[i - 1]), weights=w, target_key=i - 1, source_key=i)],
        )
    # some poses must have been marginalized (frozen)
    assert len(smoother.frozen) > 0
    for i in range(n):
        est = smoother.estimate(i)
        rot_e, trans_e = se3.pose_error(jnp.asarray(T_gt[i]), jnp.asarray(est))
        assert float(rot_e) < 5e-3 and float(trans_e) < 5e-2, (i, float(rot_e), float(trans_e))


def test_fixed_lag_smoother_late_loop_closure():
    """The smoother inherits ISAM2's late-loop-closure path: a Between factor
    referencing a pose marginalized out of the lag window triggers the global
    pose-graph relax and corrects the drifted frozen history."""
    from gtsam_points_tpu.optim.incremental import FixedLagSmoother
    from gtsam_points_tpu.optim.lm import LMParams

    T_true = [np.eye(4, dtype=np.float32)]
    for i in range(8):
        d = np.asarray(se3.se3_exp(jnp.asarray([0.0, 0.0, 0.04 * np.cos(i), 1.0, 0.0, 0.0], jnp.float32)))
        T_true.append((T_true[-1] @ d).astype(np.float32))
    bias = np.asarray(se3.se3_exp(jnp.asarray([0.0, 0.0, 0.025, 0.0, 0.0, 0.0], jnp.float32)))
    w = jnp.asarray([1e4] * 6, jnp.float32)

    sm = FixedLagSmoother(lag=2.5, lm_params=LMParams(max_iterations=10))
    sm.update(0, 0.0, jnp.eye(4), [PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0)])
    for i in range(1, 9):
        d_meas = np.linalg.inv(T_true[i - 1]) @ T_true[i] @ bias
        init = sm.estimate(i - 1) @ d_meas
        sm.update(i, float(i), jnp.asarray(init),
                  [BetweenFactor(measured=jnp.asarray(d_meas), weights=w, target_key=i - 1, source_key=i)])
    assert 0 in sm.frozen

    def ate():
        ests = [sm.estimate(i) for i in range(9)]
        gauge = T_true[0] @ np.linalg.inv(np.asarray(ests[0]))
        return float(np.mean([
            np.linalg.norm(np.asarray(se3.se3_log(jnp.asarray(
                (np.linalg.inv(T_true[i]) @ (gauge @ np.asarray(ests[i])))[None]))[0])[3:])
            for i in range(9)
        ]))

    ate_before = ate()
    loop = BetweenFactor(
        measured=jnp.asarray(np.linalg.inv(T_true[0]) @ T_true[8]),
        weights=jnp.asarray([1e5] * 6, jnp.float32), target_key=0, source_key=8,
    )
    res = sm.add_factors([loop])
    assert res.num_loop_closures == 1
    ate_after = ate()
    assert ate_after < 0.6 * ate_before, f"ATE {ate_before:.4f} -> {ate_after:.4f}"
