"""Closed-form point-set alignment.

Reference: align_points_se3 (Umeyama-style weighted SVD) and align_points_4dof
(XYZ + yaw) (include/gtsam_points/registration/alignment.hpp:12-34,
src/gtsam_points/registration/alignment.cpp). Batched over leading dims so
RANSAC evaluates thousands of hypotheses in one call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.utils import se3


def align_points_se3(source: jax.Array, target: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Weighted least-squares T s.t. T·source ≈ target.

    source/target: [..., N, 3]; weights: [..., N] or None -> [..., 4, 4].
    """
    if weights is None:
        weights = jnp.ones(source.shape[:-1], dtype=source.dtype)
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    mu_s = jnp.sum(source * w[..., None], axis=-2)
    mu_t = jnp.sum(target * w[..., None], axis=-2)
    ds = source - mu_s[..., None, :]
    dt = target - mu_t[..., None, :]
    # cross-covariance H = sum w * dt dsᵀ
    H = jnp.einsum("...n,...ni,...nj->...ij", w, dt, ds)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.zeros_like(U).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0).at[..., 2, 2].set(det)
    R = U @ D @ Vt
    t = mu_t - jnp.einsum("...ij,...j->...i", R, mu_s)
    return se3.make_transform(R, t)


def align_points_4dof(source: jax.Array, target: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Yaw + translation alignment (reference: align_points_4dof — used for
    gravity-aligned global registration)."""
    if weights is None:
        weights = jnp.ones(source.shape[:-1], dtype=source.dtype)
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    mu_s = jnp.sum(source * w[..., None], axis=-2)
    mu_t = jnp.sum(target * w[..., None], axis=-2)
    ds = source - mu_s[..., None, :]
    dt = target - mu_t[..., None, :]
    # yaw from 2D cross-covariance: maximize sum w * (dt_xy · R(yaw) ds_xy)
    sxx = jnp.sum(w * (ds[..., 0] * dt[..., 0] + ds[..., 1] * dt[..., 1]), axis=-1)
    sxy = jnp.sum(w * (ds[..., 0] * dt[..., 1] - ds[..., 1] * dt[..., 0]), axis=-1)
    yaw = jnp.arctan2(sxy, sxx)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    R = jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    t = mu_t - jnp.einsum("...ij,...j->...i", R, mu_s)
    return se3.make_transform(R, t)
