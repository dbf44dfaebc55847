"""Dogleg trust-region optimizer (reference: DoglegOptimizerExt,
include/gtsam_points/optimizers/dogleg_optimizer_ext.hpp:29) and numeric
gradient descent (optimizers/gradient_descent.hpp:69 — objective sanity tool).

Dogleg step: blend the Gauss-Newton step with the steepest-descent (Cauchy)
step inside a trust radius Delta, adapting Delta by model fidelity. Same
fused linearize-all as LM; one jitted while_loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.optim.graph import FactorGraph, retract


@dataclasses.dataclass(frozen=True)
class DoglegParams:
    max_iterations: int = 20
    initial_delta: float = 1.0
    min_delta: float = 1e-5
    max_delta: float = 1e3
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5


class DoglegResult(NamedTuple):
    poses: jax.Array
    error: jax.Array
    delta: jax.Array
    num_iterations: jax.Array


def optimize_dogleg(graph: FactorGraph, poses: jax.Array, params: Optional[DoglegParams] = None) -> DoglegResult:
    p = params or DoglegParams()

    def cond(state):
        _, _, err, it, done = state[0], state[1], state[2], state[3], state[4]
        return (it < p.max_iterations) & jnp.logical_not(done)

    def body(state):
        poses, Delta, err0, it, done = state
        # frozen-correspondence accept gate, like optimize_lm: scoring the
        # candidate on the linearization point's correspondences keeps inlier
        # churn from rejecting good steps and collapsing the trust region
        A, b, err_lin, frozen_err = graph.linearize_frozen(poses)
        # Gauss-Newton step
        Areg = A + 1e-8 * jnp.eye(A.shape[0], dtype=A.dtype)
        dx_gn = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Areg, lower=True), b)
        dx_gn = jnp.where(jnp.all(jnp.isfinite(dx_gn)), dx_gn, 0.0)
        # Cauchy (steepest descent) step: alpha = gᵀg / gᵀAg with g = b
        gAg = b @ (A @ b)
        alpha = jnp.where(gAg > 1e-12, (b @ b) / gAg, 0.0)
        dx_sd = alpha * b

        n_gn = jnp.linalg.norm(dx_gn)
        n_sd = jnp.linalg.norm(dx_sd)

        def dogleg_blend():
            # on the segment dx_sd -> dx_gn, find tau hitting ||.|| = Delta
            d = dx_gn - dx_sd
            a_ = d @ d
            b_ = 2.0 * (dx_sd @ d)
            c_ = n_sd * n_sd - Delta * Delta
            disc = jnp.maximum(b_ * b_ - 4 * a_ * c_, 0.0)
            tau = (-b_ + jnp.sqrt(disc)) / jnp.maximum(2 * a_, 1e-12)
            return dx_sd + jnp.clip(tau, 0.0, 1.0) * d

        dx = jnp.where(
            n_gn <= Delta,
            dx_gn,
            jnp.where(n_sd >= Delta, dx_sd * (Delta / jnp.maximum(n_sd, 1e-12)), dogleg_blend()),
        )
        pred = 2.0 * jnp.dot(b, dx) - dx @ (A @ dx)
        cand = retract(poses, dx)
        cand_err = frozen_err(cand)
        rho = (err_lin - cand_err) / jnp.maximum(pred, 1e-10)
        accept = (pred > 0) & (rho > 0.0) & jnp.isfinite(cand_err)
        poses_n = jax.tree_util.tree_map(lambda a, c: jnp.where(accept, c, a), poses, cand)
        Delta_n = jnp.where(
            rho > 0.75,
            jnp.minimum(Delta * 2.0, p.max_delta),
            jnp.where(rho < 0.25, jnp.maximum(Delta * 0.25, p.min_delta), Delta),
        )
        err_new = jnp.where(accept, cand_err, err_lin)
        decrease = err0 - err_new
        converged = accept & (
            (jnp.abs(decrease) < p.absolute_error_tol)
            | (jnp.abs(decrease) < p.relative_error_tol * jnp.abs(err0))
        )
        stalled = jnp.logical_not(accept) & (Delta_n <= p.min_delta)
        return (poses_n, Delta_n, err_new, it + 1, converged | stalled)

    init = (poses, jnp.float32(p.initial_delta), jnp.float32(jnp.inf), jnp.int32(0), False)
    poses_f, delta_f, err_f, it_f, _ = jax.lax.while_loop(cond, body, init)
    return DoglegResult(poses=poses_f, error=err_f, delta=delta_f, num_iterations=it_f)


def gradient_descent(graph: FactorGraph, poses: jax.Array, iterations: int = 100, step: float = 1e-3):
    """Numeric gradient descent on the graph error via AD (sanity baseline)."""

    def energy(poses):
        return graph.error(poses)

    def body(i, poses):
        P = poses.shape[0]

        def at(xi):
            return energy(retract(poses, xi))

        g = jax.grad(at)(jnp.zeros((P * 6,), jnp.float32))
        return retract(poses, -step * g)

    poses = jax.lax.fori_loop(0, iterations, body, poses)
    return poses, energy(poses)
