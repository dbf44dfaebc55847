"""Levenberg-Marquardt optimizer as one jitted lax.while_loop program.

Re-expresses LevenbergMarquardtOptimizerExt's iterate/tryLambda logic
(reference: src/gtsam_points/optimizers/levenberg_marquardt_ext.cpp:141-400) in
compiler-friendly control flow: the outer iteration and the inner lambda trial
loop are lax.while_loops, the damped solve is a dense Cholesky, and acceptance
uses the same model-fidelity gate (rho = actual / predicted decrease >
min_fidelity). One XLA program per graph structure — every LM iteration,
including correspondence updates of all factors, is a single device launch.

Cost model (matching factors/linearized.py): E(δ) ≈ E0 - 2 bᵀδ + δᵀAδ,
step δ = (A + λ·damp)⁻¹ b, predicted decrease = 2bᵀδ - δᵀAδ.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.optim.graph import FactorGraph, retract


@dataclasses.dataclass(frozen=True)
class LMParams:
    max_iterations: int = 20
    max_inner_iterations: int = 10
    lambda_initial: float = 1e-5
    lambda_factor: float = 10.0
    lambda_lower_bound: float = 1e-10
    lambda_upper_bound: float = 1e5
    min_fidelity: float = 1e-3
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    step_tol: float = 1e-4  # accepted-step norm below which we're converged
    diagonal_damping: bool = True
    # Correspondence-update tolerance (reference:
    # set_correspondence_update_tolerance, impl/integrated_icp_factor_impl.hpp:
    # 128-143; GPU inlier recompute gate, integrated_vgicp_derivatives.cuh:
    # 30-34): while no pose has moved more than this since the last
    # correspondence search, matching factors reuse their cached
    # correspondences/weights and each LM iteration skips the probe/kNN —
    # typically >2x faster registration. 0.0 = search every iteration.
    correspondence_update_tolerance_rot: float = 0.0
    correspondence_update_tolerance_trans: float = 0.0


class LMStatus(NamedTuple):
    """Per-iteration telemetry (reference: LevenbergMarquardtOptimizationStatus,
    optimizers/levenberg_marquardt_optimization_status.hpp)."""

    error: jax.Array  # [max_iter]
    lambda_: jax.Array  # [max_iter]
    inner_iterations: jax.Array  # [max_iter]
    num_iterations: jax.Array  # ()


class LMResult(NamedTuple):
    poses: jax.Array
    error: jax.Array
    status: LMStatus


def _solve_damped(A, b, lam, diagonal_damping: bool):
    from gtsam_points_tpu.utils.solve6 import solve_small

    dim = A.shape[0]
    if diagonal_damping:
        diag = jnp.clip(jnp.diag(A), 1e-10, None)
        Ad = A + lam * jnp.diag(diag)
    else:
        Ad = A + lam * jnp.eye(dim, dtype=A.dtype)
    # unrolled Cholesky for small pose counts (dim = 6P <= 18): the generic
    # blocked cho_factor/cho_solve lowers to sequential triangular-solve
    # loops whose fixed cost dominates a 1-2 pose LM inner iteration
    # (measured 2.5x on the batched GN loop, round 5); falls back to
    # cho_solve above 3 poses
    delta = solve_small(Ad, b)
    ok = jnp.all(jnp.isfinite(delta))
    return jnp.where(ok, delta, 0.0), ok


def optimize_lm(graph: FactorGraph, poses: jax.Array, params: Optional[LMParams] = None) -> LMResult:
    """Run LM to convergence. Jit-compatible; wrap in jax.jit for repeated use."""
    params = params or LMParams()
    return _optimize_lm(graph, poses, params)


def _optimize_lm(graph: FactorGraph, poses: jax.Array, params: LMParams) -> LMResult:
    p = params
    max_it = p.max_iterations
    use_corr_cache = (
        p.correspondence_update_tolerance_rot > 0.0
        or p.correspondence_update_tolerance_trans > 0.0
    )

    def outer_cond(state):
        poses, lam, err, it, done, status, corr, probe_poses, force_refresh = state
        return (it < max_it) & jnp.logical_not(done)

    def outer_body(state):
        poses, lam, err0, it, done, status, corr, probe_poses, force_refresh = state
        # err_lin = error with correspondences at the linearization point;
        # frozen_error evaluates candidates on that same correspondence set so
        # the accept gate compares model and objective consistently even when
        # the inlier set churns between outer iterations (classic ICP
        # majorize-minimize; the reference gates on the churning error and
        # relies on small perturbations instead).
        if use_corr_cache:
            from gtsam_points_tpu.utils import se3

            rot_d, trans_d = se3.pose_error(probe_poses, poses)
            refreshed = (
                (jnp.max(rot_d) > p.correspondence_update_tolerance_rot)
                | (jnp.max(trans_d) > p.correspondence_update_tolerance_trans)
                | force_refresh
            )
            corr = jax.lax.cond(
                refreshed, lambda c: graph.correspondences(poses), lambda c: c, corr
            )
            probe_poses = jnp.where(refreshed, poses, probe_poses)
        else:
            refreshed = jnp.bool_(True)
            corr = graph.correspondences(poses)
        A, b, err_lin, frozen_error = graph.linearize_frozen(poses, corr)

        # BATCHED LAMBDA LADDER (round 5): the sequential inner loop tries
        # lam, lam*f, lam*f^2, ... until the first acceptable candidate — a
        # data-dependent while_loop whose per-try solve + frozen-error eval
        # dominated the single-stream LM (measured 11.7 -> 2.5 ms when the
        # ladder collapsed to one try). Since no accept happens before the
        # first accept, the ladder's lambdas are KNOWN up front: solve all K
        # damped systems (unrolled small-Cholesky batches on the VPU),
        # retract all K candidates, and take the FIRST acceptable — bitwise
        # the same accept/lambda/tries semantics as the sequential loop
        # (candidates beyond lambda_upper_bound are masked exactly like the
        # loop's exit condition). Error evaluation is TWO-STAGE: candidate 0
        # alone first (the common case accepts it — one eval, like the
        # sequential loop's fast path), and only on rejection the remaining
        # K-1 candidates in one fused batched pass (lax.cond skips it
        # otherwise). Reference analogue: the lambda-trial loop of
        # levenberg_marquardt_ext.cpp:181-330, restructured the TPU way.
        K = p.max_inner_iterations
        lams = lam * p.lambda_factor ** jnp.arange(K, dtype=jnp.float32)
        in_bound = lams <= p.lambda_upper_bound
        deltas, oks = jax.vmap(
            lambda l: _solve_damped(A, b, l, p.diagonal_damping)
        )(lams)  # [K, 6P], [K]
        pred_decreases = 2.0 * (deltas @ b) - jnp.einsum(
            "ki,ij,kj->k", deltas, A, deltas
        )
        cands = jax.vmap(lambda d: retract(poses, d))(deltas)

        def gate(errs_k, idx):
            rho = (err_lin - errs_k) / jnp.maximum(pred_decreases[idx], 1e-10)
            return (
                oks[idx]
                & in_bound[idx]
                & (pred_decreases[idx] > 0)
                & (rho > p.min_fidelity)
                & jnp.isfinite(errs_k)
            )

        err0_c = frozen_error(jax.tree_util.tree_map(lambda c: c[0], cands))
        accept0 = gate(err0_c, 0)

        def eval_rest(_):
            errs = jax.vmap(frozen_error)(
                jax.tree_util.tree_map(lambda c: c[1:], cands)
            )
            return jnp.concatenate([err0_c[None], errs])

        def skip_rest(_):
            return jnp.concatenate(
                [err0_c[None], jnp.full((K - 1,), jnp.inf, jnp.float32)]
            )

        if K > 1:
            cand_errs = jax.lax.cond(accept0, skip_rest, eval_rest, None)
        else:
            cand_errs = err0_c[None]
        accept_k = gate(cand_errs, jnp.arange(K))
        accepted = jnp.any(accept_k)
        first = jnp.argmax(accept_k)  # index of the first True (0 if none)
        num_tried = jnp.sum(in_bound.astype(jnp.int32))
        poses_n = jax.tree_util.tree_map(
            lambda a, c: jnp.where(accepted, c[first], a), poses, cands
        )
        err_n = jnp.where(accepted, cand_errs[first], err_lin)
        lam_n = jnp.where(
            accepted,
            jnp.maximum(lams[first] / p.lambda_factor, p.lambda_lower_bound),
            lam * jnp.float32(p.lambda_factor) ** num_tried.astype(jnp.float32),
        )
        tries = jnp.where(accepted, first + 1, num_tried)
        step_norm = jnp.where(accepted, jnp.linalg.norm(deltas[first]), 0.0)
        err_new = jnp.where(accepted, err_n, err_lin)
        # convergence: small accepted step, or fresh-error decrease below tols
        decrease = err0 - err_lin  # fresh errors across outer iterations
        small_err_change = (jnp.abs(decrease) < p.absolute_error_tol) | (
            jnp.abs(decrease) < p.relative_error_tol * jnp.abs(err0)
        )
        converged = accepted & ((step_norm < p.step_tol) | (small_err_change & (it > 0)))
        stuck = jnp.logical_not(accepted)
        at_rest = converged | stuck
        # Finishing on CACHED correspondences is premature: the surrogate may
        # be at a fixed point while fresh correspondences would keep improving.
        # Refresh and give LM another round; only a fresh-correspondence
        # fixed point terminates (with tolerance disabled, refreshed == True
        # and this reduces to the plain condition).
        done_now = at_rest & refreshed
        refresh_next = at_rest & jnp.logical_not(refreshed)
        status = LMStatus(
            error=status.error.at[it].set(err_lin),
            lambda_=status.lambda_.at[it].set(lam_n),
            inner_iterations=status.inner_iterations.at[it].set(tries),
            num_iterations=it + 1,
        )
        return (poses_n, lam_n, err_lin, it + 1, done_now, status, corr, probe_poses, refresh_next)

    status0 = LMStatus(
        error=jnp.full((max_it,), jnp.inf, jnp.float32),
        lambda_=jnp.zeros((max_it,), jnp.float32),
        inner_iterations=jnp.zeros((max_it,), jnp.int32),
        num_iterations=jnp.int32(0),
    )
    # initial correspondences at the start point (iteration 0 reuses them:
    # moved = 0 <= tolerance)
    corr0 = graph.correspondences(poses)
    init = (
        poses,
        jnp.float32(p.lambda_initial),
        jnp.float32(jnp.inf),
        jnp.int32(0),
        False,
        status0,
        corr0,
        poses,
        jnp.bool_(False),
    )
    poses_f, lam_f, err_f, it_f, _, status_f, _, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    return LMResult(poses=poses_f, error=err_f, status=status_f)


class GNResult(NamedTuple):
    poses: jax.Array
    error: jax.Array


def optimize_gn(graph: FactorGraph, poses: jax.Array, iterations: int = 10, damping: float = 1e-6) -> GNResult:
    """Plain Gauss-Newton with fixed iteration count (cheap odometry inner loop)."""

    def body(i, poses):
        A, b, _ = graph.linearize_full(poses)
        delta, ok = _solve_damped(A, b, jnp.float32(damping), True)
        return retract(poses, jnp.where(ok, delta, 0.0))

    poses = jax.lax.fori_loop(0, iterations, body, poses)
    return GNResult(poses=poses, error=graph.error(poses))
