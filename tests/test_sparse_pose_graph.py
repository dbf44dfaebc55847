"""Block-sparse pose-graph solver (optim/sparse.py): matches the dense path
on small graphs, and optimizes a 500-pose graph with memory linear in edges
(reference analogue: SparseLinearSystemBuilder,
optimizers/linear_system_builder.hpp:15-73)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.factors import BetweenFactor, PriorFactor
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.sparse import (
    linearize_pose_graph,
    make_pose_graph,
    optimize_pose_graph,
    pose_graph_error,
    solve_cg_block,
    sparse_matvec,
)
from gtsam_points_tpu.utils import se3


def chain_graph(n, loop_every=0, seed=0, noise=0.05):
    rng = np.random.RandomState(seed)
    T = [np.eye(4, dtype=np.float32)]
    between = []
    for i in range(1, n):
        xi = np.array([0.02, 0.0, 0.04, 1.0, 0.1, 0.0], np.float32)
        d = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        T.append(T[-1] @ d)
        between.append(
            BetweenFactor(measured=jnp.asarray(d), weights=jnp.ones(6) * 100.0, target_key=i - 1, source_key=i)
        )
    if loop_every:
        for i in range(loop_every, n, loop_every):
            j = i - loop_every
            d = np.linalg.inv(T[j]) @ T[i]
            between.append(
                BetweenFactor(measured=jnp.asarray(d), weights=jnp.ones(6) * 50.0, target_key=j, source_key=i)
            )
    priors = [PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0)]
    init = np.stack(
        [t @ np.asarray(se3.se3_exp(jnp.asarray(rng.randn(6).astype(np.float32) * noise))) for t in T]
    )
    return between, priors, jnp.asarray(np.stack(T)), jnp.asarray(init)


def test_sparse_matvec_matches_dense():
    between, priors, T_gt, init = chain_graph(12, loop_every=4)
    pg = make_pose_graph(between, priors)
    sys = linearize_pose_graph(pg, init)

    # dense assembly via the existing graph path
    g = FactorGraph(num_poses=12)
    for f in priors + between:
        g.add(f)
    A, b, err = g.linearize_full(init)
    np.testing.assert_allclose(float(sys.error), float(err), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sys.b).reshape(-1), np.asarray(b), rtol=1e-4, atol=1e-3)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(12, 6).astype(np.float32))
    y_sparse = sparse_matvec(sys, x, jnp.float32(0.0))
    y_dense = (np.asarray(A) @ np.asarray(x).reshape(-1)).reshape(12, 6)
    np.testing.assert_allclose(np.asarray(y_sparse), y_dense, rtol=1e-3, atol=1e-2)


def test_sparse_cg_solve_matches_dense_solve():
    between, priors, T_gt, init = chain_graph(10, loop_every=3)
    pg = make_pose_graph(between, priors)
    sys = linearize_pose_graph(pg, init)
    lam = jnp.float32(1e-4)
    delta = solve_cg_block(sys, lam, tol=1e-10, maxiter=500)

    g = FactorGraph(num_poses=10)
    for f in priors + between:
        g.add(f)
    A, b, _ = g.linearize_full(init)
    Ad = np.asarray(A) + float(lam) * np.diag(np.clip(np.diag(np.asarray(A)), 1e-10, None))
    ref = np.linalg.solve(Ad, np.asarray(b))
    np.testing.assert_allclose(np.asarray(delta).reshape(-1), ref, rtol=2e-2, atol=2e-3)


def test_sparse_optimize_matches_dense_small():
    between, priors, T_gt, init = chain_graph(8, loop_every=0, noise=0.05)
    pg = make_pose_graph(between, priors)
    res = jax.jit(lambda p: optimize_pose_graph(pg, p))(init)

    g = FactorGraph(num_poses=8)
    for f in priors + between:
        g.add(f)
    dense = optimize_lm(g, init)
    for i in range(8):
        rot_e, trans_e = se3.pose_error(dense.poses[i], res.poses[i])
        assert float(rot_e) < 1e-3 and float(trans_e) < 1e-2, (i, float(rot_e), float(trans_e))


def test_sparse_500_pose_graph():
    """500 poses + loop closures: optimizes to GT in one jitted program with
    O(P + E) memory (the dense path would materialize a 3000x3000 system and
    is deliberately not run here)."""
    n = 500
    between, priors, T_gt, init = chain_graph(n, loop_every=25, noise=0.03)
    pg = make_pose_graph(between, priors)
    res = jax.jit(lambda p: optimize_pose_graph(pg, p, cg_maxiter=200))(init)
    assert bool(jnp.all(jnp.isfinite(res.poses)))
    err0 = float(pose_graph_error(pg, init))
    err1 = float(res.error)
    assert err1 < err0 * 1e-2
    worst_rot, worst_trans = 0.0, 0.0
    for i in range(0, n, 25):
        rot_e, trans_e = se3.pose_error(T_gt[i], res.poses[i])
        worst_rot = max(worst_rot, float(rot_e))
        worst_trans = max(worst_trans, float(trans_e))
    assert worst_rot < 5e-3 and worst_trans < 5e-2, (worst_rot, worst_trans)


def test_full_edge_info_beats_diagonal_on_coupled_errors():
    """VERDICT r3 item 4: PoseGraphEdges carries full [E,6,6] information.

    Deterministic fusion test where the rot-trans coupling matters: edge A's
    information is the Hessian of a one-sided-wall registration (x-residuals
    with J_rotz = -y, J_tx = 1 over y in [0,20] -> strong yaw/tx coupling),
    and A's measurement errs along that block's WEAK eigendirection (how a
    real registration errs). Edge B is an exact isotropic measurement of the
    same relative pose. Fusing with the full information down-weights A
    along exactly the direction it errs (Om_A n_weak = lambda_weak n_weak),
    while the diagonal approximation sees a large rot-z information for a
    vector that is mostly tx — closed form predicts ~2x worse. The reference
    retains the full dense Hessian (integrated_matching_cost_factor.cpp:
    37-55); this pins why.
    """
    from gtsam_points_tpu.optim.sparse import PoseGraphEdges, optimize_pose_graph

    T_true = np.asarray(se3.se3_exp(jnp.asarray([0, 0, 0.1, 1.0, 0.2, 0.0], jnp.float32)))

    ys = np.linspace(0.0, 20.0, 64).astype(np.float32)
    J = np.zeros((64, 6), np.float32)
    J[:, 2] = -ys
    J[:, 3] = 1.0
    Om_A = (J.T @ J).astype(np.float64) + np.diag([200, 200, 0, 0, 200, 200])
    w_eig, V = np.linalg.eigh(Om_A)
    n_weak = V[:, 0].astype(np.float32) * 0.2  # error along weakest direction
    Om_A = Om_A.astype(np.float32)

    measured = np.stack([
        T_true @ np.asarray(se3.se3_exp(jnp.asarray(n_weak))),  # edge A: noisy
        T_true,                                                  # edge B: exact
    ])
    infos = np.stack([Om_A, np.eye(6, dtype=np.float32) * 25.0])

    base = dict(
        measured=jnp.asarray(measured),
        t_idx=jnp.asarray(np.zeros(2, np.int32)),
        s_idx=jnp.asarray(np.ones(2, np.int32)),
        prior_T=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        prior_w=jnp.asarray(np.full((1, 6), 1e6, np.float32)),
        prior_idx=jnp.asarray(np.zeros(1, np.int32)),
    )
    diag_w = jnp.asarray(np.diagonal(infos, axis1=1, axis2=2).copy())
    pg_full = PoseGraphEdges(weights=diag_w, info=jnp.asarray(infos), **base)
    pg_diag = PoseGraphEdges(weights=diag_w, **base)

    poses0 = jnp.asarray(np.stack([np.eye(4, dtype=np.float32),
                                   measured[0].astype(np.float32)]))

    def err(res):
        T_err = np.linalg.inv(T_true) @ np.asarray(res.poses[1])
        return float(np.linalg.norm(np.asarray(
            se3.se3_log(jnp.asarray(T_err[None].astype(np.float32)))[0])))

    res_full = jax.jit(lambda p: optimize_pose_graph(pg_full, p, max_iterations=50))(poses0)
    res_diag = jax.jit(lambda p: optimize_pose_graph(pg_diag, p, max_iterations=50))(poses0)
    e_full, e_diag = err(res_full), err(res_diag)
    assert e_full < 0.7 * e_diag, (e_full, e_diag)
    assert np.isfinite(float(res_full.error))
