"""Gauss-Newton linearization core shared by all matching-cost factors.

The reference reduces per-point contributions into a `LinearizedSystem6`
monoid {error, H_target, H_source, H_target_source, b_target, b_source}
(reference: include/gtsam_points/cuda/kernels/linearized_system.cuh:10-72,
factors/impl/scan_matching_reduction.hpp:16-191). Here that reduction is a
masked einsum over the point axis — a [6,N]x[N,6] matmul that rides the MXU —
and the per-point Jacobians come from forward-mode AD of the residual function
at zero tangent (right-retraction T·Exp(xi), GTSAM convention), so every factor
is defined by its residual alone and is exact by construction.

Cost convention: E = sum_i r_iᵀ W_i r_i, H = JᵀWJ, b = -JᵀWr, step = H⁻¹b.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.utils import se3


class Linearized(NamedTuple):
    """Per-factor 6-DoF Gauss-Newton block system (binary: target, source)."""

    H_tt: jax.Array  # [6, 6]
    H_ss: jax.Array  # [6, 6]
    H_ts: jax.Array  # [6, 6]
    b_t: jax.Array  # [6]
    b_s: jax.Array  # [6]
    error: jax.Array  # ()
    num_inliers: jax.Array  # ()


def linearize_residuals(
    residual_fn: Callable,
    T_target: jax.Array,
    T_source: jax.Array,
) -> Linearized:
    """Linearize sum_i r_iᵀ W_i r_i around (T_target, T_source).

    residual_fn(T_t, T_s) -> (r [N, D], W, mask [N]) where W is [N, D, D],
    [N] (scalar weights), or None (identity). W and mask must not depend on the
    perturbation (frozen at the linearization point, like the reference's
    cached mahalanobis weights, impl/integrated_gicp_factor_impl.hpp:151-296).
    """
    zero = jnp.zeros((12,), dtype=jnp.float32)

    def at(xi):
        r, _, _ = residual_fn(T_target @ se3.se3_exp(xi[:6]), T_source @ se3.se3_exp(xi[6:]))
        return r

    r0, W, mask = residual_fn(T_target, T_source)
    J = jax.jacfwd(at)(zero)  # [N, D, 12]
    return reduce_system(r0, J, W, mask)


def reduce_system(r: jax.Array, J: jax.Array, W, mask: jax.Array) -> Linearized:
    """Masked reduction of per-point (r [N,D], J [N,D,12], W) into Linearized."""
    n, d = r.shape
    m = mask.astype(r.dtype)
    if W is None:
        Wr = r * m[:, None]
        WJ = J * m[:, None, None]
    elif W.ndim == 1:
        Wr = r * (W * m)[:, None]
        WJ = J * (W * m)[:, None, None]
    else:
        Wm = W * m[:, None, None]
        Wr = jnp.einsum("nij,nj->ni", Wm, r)
        WJ = jnp.einsum("nij,njk->nik", Wm, J)

    Jf = J.reshape(n * d, 12)
    WJf = WJ.reshape(n * d, 12)
    H = Jf.T @ WJf  # [12, 12] — MXU matmul over the point axis
    b = -(Jf.T @ Wr.reshape(n * d))
    err = jnp.sum(Wr.reshape(n * d) * r.reshape(n * d))
    return Linearized(
        H_tt=H[:6, :6],
        H_ss=H[6:, 6:],
        H_ts=H[:6, 6:],
        b_t=b[:6],
        b_s=b[6:],
        error=err,
        num_inliers=jnp.sum(mask.astype(jnp.int32)),
    )


def evaluate_error(residual_fn, T_target, T_source):
    r, W, mask = residual_fn(T_target, T_source)
    m = mask.astype(r.dtype)
    if W is None:
        return jnp.sum(r * r * m[:, None])
    if W.ndim == 1:
        return jnp.sum(jnp.sum(r * r, axis=-1) * W * m)
    return jnp.sum(jnp.einsum("ni,nij,nj->n", r, W, r) * m)


def inv3x3(A: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate), f32.

    Near-singular inputs (relative to their own scale) return ZERO instead of
    an exploded adjugate/det ratio — for the mahalanobis-weight use this means
    a degenerate correspondence contributes nothing rather than dominating the
    cost with garbage (the failure mode that stalled LM on real data)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    scale = (jnp.abs(a) + jnp.abs(e) + jnp.abs(i)) / 3.0
    bad = jnp.abs(det) <= 1e-9 * scale * scale * scale + 1e-30
    inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
    adj = jnp.stack(
        [
            jnp.stack([co_a, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([co_c, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]
