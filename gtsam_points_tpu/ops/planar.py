"""Planar (structure-of-planes) kernels for the hot linearization paths.

TPU vector registers are (8 sublanes x 128 lanes); arrays shaped [N, 3] or
[N, 3, 3] use 3 of 128 lanes and force relayouts on every slice/stack. The
planar layout puts the POINT axis in lanes — points [3, N], symmetric 3x3
matrices as 6 planes [6, N] (xx, xy, xz, yy, yz, zz) — so every elementwise
op runs at full lane occupancy and the Gauss-Newton reduction becomes one
[12, 3N] x [3N, 12] MXU matmul.

This is the TPU re-design of the reference's per-point CUDA linearization
(reference: cuda/kernels/vgicp_derivatives.cuh:16-87 computes per-point
LinearizedSystem6 then cub-reduces; here the whole batch is a handful of
full-lane planar ops + one matmul). Jacobians are analytic (right
perturbation, matching utils/se3.se3_exp's [rot, trans] tangent convention)
and verified against the AD path in tests/test_planar.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.linearized import Linearized


def sym_mul(W6: jax.Array, v: jax.Array) -> jax.Array:
    """Symmetric-3x3-times-vector in planar form: W6 [6, N], v [3, N] -> [3, N]."""
    xx, xy, xz, yy, yz, zz = W6
    return jnp.stack(
        [
            xx * v[0] + xy * v[1] + xz * v[2],
            xy * v[0] + yy * v[1] + yz * v[2],
            xz * v[0] + yz * v[1] + zz * v[2],
        ]
    )


def sym_inv(C6: jax.Array) -> jax.Array:
    """Planar symmetric 3x3 inverse with the same degenerate-input policy as
    factors.linearized.inv3x3 (near-singular -> zero)."""
    xx, xy, xz, yy, yz, zz = C6
    co_xx = yy * zz - yz * yz
    co_xy = -(xy * zz - yz * xz)
    co_xz = xy * yz - yy * xz
    det = xx * co_xx + xy * co_xy + xz * co_xz
    scale = (jnp.abs(xx) + jnp.abs(yy) + jnp.abs(zz)) / 3.0
    bad = jnp.abs(det) <= 1e-9 * scale * scale * scale + 1e-30
    inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
    co_yy = xx * zz - xz * xz
    co_yz = -(xx * yz - xy * xz)
    co_zz = xx * yy - xy * xy
    return jnp.stack([co_xx, co_xy, co_xz, co_yy, co_yz, co_zz]) * inv_det


def sym_rotate(R: jax.Array, C6: jax.Array) -> jax.Array:
    """Planar congruence transform R C Rᵀ: R [3,3] const, C6 [6, N] -> [6, N]."""
    xx, xy, xz, yy, yz, zz = C6
    # M = C Rᵀ, rows of M in planar form: M[i][j] = sum_k C[i,k] R[j,k]
    C = ((xx, xy, xz), (xy, yy, yz), (xz, yz, zz))
    M = [[C[i][0] * R[j, 0] + C[i][1] * R[j, 1] + C[i][2] * R[j, 2] for j in range(3)] for i in range(3)]
    # out[i][j] = sum_k R[i,k] M[k][j], upper triangle only
    def entry(i, j):
        return R[i, 0] * M[0][j] + R[i, 1] * M[1][j] + R[i, 2] * M[2][j]

    return jnp.stack([entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2), entry(2, 2)])


def transform(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply SE3 [4,4] to planar points [3, N] -> [3, N] (one small matmul)."""
    return T[:3, :3] @ p + T[:3, 3][:, None]


def _skew_cols(x: jax.Array):
    """Columns of skew(x) for planar x [3, N]: three [3, N] planes."""
    z = jnp.zeros_like(x[0])
    c0 = jnp.stack([z, x[2], -x[1]])
    c1 = jnp.stack([-x[2], z, x[0]])
    c2 = jnp.stack([x[1], -x[0], z])
    return c0, c1, c2


def linearize_point_system(
    p_src: jax.Array,
    pm: jax.Array,
    r: jax.Array,
    W6: Optional[jax.Array],
    mask: jax.Array,
    R_delta: jax.Array,
) -> Linearized:
    """Analytic Gauss-Newton system for residuals affine in the moved point.

    r(ξt, ξs) = [inv(T_t·Exp(ξt))·T_s·Exp(ξs)]·p - q evaluated at ξ = 0, with
      J_t = [skew(pm) | -I]          (pm = delta·p, delta = inv(T_t)·T_s)
      J_s = [-R_delta·skew(p) | R_delta]
    (right perturbation; identical to forward-mode AD of
    factors.linearized.linearize_residuals — see tests/test_planar.py).

    p_src, pm, r: [3, N] planar; W6: [6, N] symmetric weights or None;
    mask: [N] bool; R_delta: [3, 3].
    """
    n = r.shape[1]
    m = mask.astype(r.dtype)

    s0, s1, s2 = _skew_cols(pm)
    e0 = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0], r.dtype)[:, None], (3, n))
    e1 = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], r.dtype)[:, None], (3, n))
    e2 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], r.dtype)[:, None], (3, n))
    k0, k1, k2 = _skew_cols(p_src)
    Rk0, Rk1, Rk2 = (-(R_delta @ k) for k in (k0, k1, k2))
    Rc = [jnp.broadcast_to(R_delta[:, i][:, None], (3, n)) for i in range(3)]

    # J [12, 3, N]: columns of the per-point 3x12 Jacobian as planar planes
    J = jnp.stack([s0, s1, s2, e0, e1, e2, Rk0, Rk1, Rk2, Rc[0], Rc[1], Rc[2]])

    if W6 is None:
        Wm = jnp.stack([m, jnp.zeros_like(m), jnp.zeros_like(m), m, jnp.zeros_like(m), m])
    else:
        Wm = W6 * m
    Wr = sym_mul(Wm, r)
    WJ = jax.vmap(lambda col: sym_mul(Wm, col))(J)  # [12, 3, N]

    Jf = J.reshape(12, 3 * n)
    WJf = WJ.reshape(12, 3 * n)
    H = Jf @ WJf.T  # [12, 12] — MXU over the 3N axis
    b = -(Jf @ Wr.reshape(3 * n))
    err = jnp.sum(Wr * r)
    return Linearized(
        H_tt=H[:6, :6],
        H_ss=H[6:, 6:],
        H_ts=H[:6, 6:],
        b_t=b[:6],
        b_s=b[6:],
        error=err,
        num_inliers=jnp.sum(mask.astype(jnp.int32)),
    )


def weighted_error(r: jax.Array, W6: Optional[jax.Array], mask: jax.Array) -> jax.Array:
    """sum_n r_nᵀ W_n r_n over planar residuals."""
    m = mask.astype(r.dtype)
    if W6 is None:
        return jnp.sum(r * r * m)
    Wr = sym_mul(W6 * m, r)
    return jnp.sum(Wr * r)
