"""Batched closed-form symmetric 3x3 eigendecomposition.

The reference leans on Eigen::SelfAdjointEigenSolver inside per-point loops
(covariance regularization, BALM eigenvalue factors — reference:
src/gtsam_points/features/covariance_estimation.cpp,
include/gtsam_points/factors/balm_feature.hpp:11-100). On TPU a LAPACK-style
iterative eigh over [N,3,3] batches is the wrong tool; this module implements
the analytic trigonometric eigenvalue formula plus Eberly-style robust
eigenvector extraction, fully vectorized on the VPU.

Returns eigenvalues in ASCENDING order (matching numpy.linalg.eigh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def eigvals3(A: jax.Array) -> jax.Array:
    """Analytic eigenvalues of symmetric [..., 3, 3], ascending."""
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.where(p > _EPS, detB / jnp.maximum(2.0 * p * p * p, _EPS), 0.0)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def _eigvec(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvector of A for eigenvalue lam via largest cross product of rows
    of (A - lam I)."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    v = jnp.take_along_axis(
        jnp.stack([c01, c02, c12], axis=-2), best[..., None, None], axis=-2
    )[..., 0, :]
    nv2 = jnp.sum(v * v, axis=-1, keepdims=True)
    # Degenerate (repeated eigenvalue / zero matrix): fall back to an arbitrary
    # unit vector; callers treat the eigenbasis as any orthonormal frame then.
    # Test on nv2 BEFORE the sqrt so the zero-matrix case robustly triggers.
    small = nv2[..., 0] < 1e-12
    nv = jnp.sqrt(jnp.where(small[..., None], 1.0, nv2))
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=A.dtype), v.shape)
    return jnp.where(small[..., None], fallback, v / nv)


def eigh3(A: jax.Array):
    """Symmetric [..., 3, 3] -> (eigvals [..., 3] ascending, eigvecs [..., 3, 3]
    with eigvecs[..., :, i] the i-th eigenvector)."""
    # scale for conditioning
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    As = A / scale[..., None, None]
    w = eigvals3(As)
    v_hi = _eigvec(As, w[..., 2])
    v_lo = _eigvec(As, w[..., 0])
    # re-orthogonalize: v_lo against v_hi, middle by cross product
    v_lo = v_lo - jnp.sum(v_lo * v_hi, axis=-1, keepdims=True) * v_hi
    nlo = jnp.sqrt(jnp.maximum(jnp.sum(v_lo * v_lo, axis=-1, keepdims=True), _EPS))
    alt = jnp.cross(v_hi, jnp.broadcast_to(jnp.array([0.57735, 0.57735, 0.57735], dtype=A.dtype), v_hi.shape))
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), _EPS)
    v_lo = jnp.where(nlo < 1e-6, alt, v_lo / nlo)
    v_mid = jnp.cross(v_hi, v_lo)
    V = jnp.stack([v_lo, v_mid, v_hi], axis=-1)  # columns
    return w * scale[..., None], V
