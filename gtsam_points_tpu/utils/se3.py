"""Batched SO(3)/SE(3) Lie-group operations (float32, TPU-friendly).

Conventions (matching GTSAM so accuracy bounds of the reference tests apply):
- Poses are 4x4 homogeneous matrices (float32).
- Tangent vectors are 6-vectors ordered (omega, v) — rotation first — the
  same ordering as gtsam::Pose3 tangent space used throughout the reference
  factors (reference: include/gtsam_points/factors/impl/integrated_icp_factor_impl.hpp:204).
- Retraction is right-multiplicative: T_new = T @ Expmap(xi), matching
  gtsam::traits<Pose3>::Retract used by the reference optimizers.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: jax.Array):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3), Taylor-safe."""
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < 1e-8
    # Taylor expansions around 0
    a_t = 1.0 - theta2 / 6.0
    b_t = 0.5 - theta2 / 24.0
    c_t = 1.0 / 6.0 - theta2 / 120.0
    safe = jnp.where(small, 1.0, theta)
    a = jnp.where(small, a_t, jnp.sin(safe) / safe)
    b = jnp.where(small, b_t, (1.0 - jnp.cos(safe)) / jnp.maximum(theta2, _EPS))
    c = jnp.where(small, c_t, (safe - jnp.sin(safe)) / jnp.maximum(theta2 * safe, _EPS))
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation -> [..., 3] axis-angle (theta in [0, pi]).

    Quaternion-based: robust both near identity and near pi (unlike the
    trace/vee formula). q = (v, w) with w >= 0, theta = 2 atan2(|v|, w),
    log = theta * v/|v|.
    """
    q = rot_to_quat(R)
    sign = jnp.where(q[..., 3] < 0, -1.0, 1.0)
    v = q[..., :3] * sign[..., None]
    qw = q[..., 3] * sign
    nv2 = jnp.sum(v * v, axis=-1)
    small = nv2 < 1e-10
    nv = jnp.sqrt(jnp.where(small, 1.0, nv2))  # safe sqrt (grad-safe at 0)
    theta = 2.0 * jnp.arctan2(nv, qw)
    # log = v * theta/|v|; near 0: theta/|v| = 2/qw * (1 - (|v|/qw)^2 / 3 + ...)
    qw_safe = jnp.maximum(qw, 1e-3)
    taylor = 2.0 / qw_safe * (1.0 - nv2 / (3.0 * qw_safe * qw_safe))
    scale = jnp.where(small, taylor, theta / nv)
    return v * scale[..., None]


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian V of SO(3): Expmap translation coupling matrix."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_coeffs(theta2)
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * (K @ K)


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    K = skew(w)
    small = theta2 < 1e-8
    half = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * (K @ K)


def se3_exp(xi: jax.Array) -> jax.Array:
    """[..., 6] (omega, v) -> [..., 4, 4] homogeneous transform."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return make_transform(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """[..., 4, 4] -> [..., 6] (omega, v)."""
    w = so3_log(T[..., :3, :3])
    v = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(w), T[..., :3, 3])
    return jnp.concatenate([w, v], axis=-1)


def make_transform(R: jax.Array, t: jax.Array) -> jax.Array:
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [..., 4, 4] to [..., N, 3] points."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]


def rotate_points(T: jax.Array, vecs: jax.Array) -> jax.Array:
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], vecs)


def adjoint(T: jax.Array) -> jax.Array:
    """[..., 4, 4] -> [..., 6, 6] adjoint in (omega, v) ordering: Ad(T)=[[R,0],[ [t]x R, R]]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, zeros], axis=-1)
    bottom = jnp.concatenate([skew(t) @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Quaternion [..., 4] in (x, y, z, w) order (graph.txt convention of the
    reference data, see /root/reference/src/demo/demo_matching_cost_factors.cpp)
    -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (x, y, z, w).

    Shepperd's method with branch selection: each of the four constructions
    divides by sqrt(c_i) where the SELECTED c_i = max_i >= 1 (the four sum to
    4), so the sqrt is bounded away from zero and the whole map is
    differentiable — required because factors AD through Logmap residuals.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    c = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    case = jnp.argmax(c, axis=-1)
    c_sel = jnp.take_along_axis(c, case[..., None], axis=-1)[..., 0]
    s = jnp.sqrt(jnp.maximum(c_sel, 1e-12))  # >= 1 for the selected branch
    inv2s = 0.5 / s
    half_s = 0.5 * s

    # branch 0: qw = s/2
    q0 = jnp.stack([(m21 - m12) * inv2s, (m02 - m20) * inv2s, (m10 - m01) * inv2s, half_s], axis=-1)
    # branch 1: qx = s/2
    q1 = jnp.stack([half_s, (m01 + m10) * inv2s, (m02 + m20) * inv2s, (m21 - m12) * inv2s], axis=-1)
    # branch 2: qy = s/2
    q2 = jnp.stack([(m01 + m10) * inv2s, half_s, (m12 + m21) * inv2s, (m02 - m20) * inv2s], axis=-1)
    # branch 3: qz = s/2
    q3 = jnp.stack([(m02 + m20) * inv2s, (m12 + m21) * inv2s, half_s, (m10 - m01) * inv2s], axis=-1)

    q = jnp.select(
        [case[..., None] == 0, case[..., None] == 1, case[..., None] == 2],
        [q0, q1, q2],
        q3,
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def pose_from_xyzq(xyzq: jax.Array) -> jax.Array:
    """[..., 7] = (x, y, z, qx, qy, qz, qw) -> [..., 4, 4]."""
    return make_transform(quat_to_rot(xyzq[..., 3:7]), xyzq[..., :3])


def pose_error(T_a: jax.Array, T_b: jax.Array):
    """Rotation (rad) and translation (m) error between two poses."""
    dT = se3_inverse(T_a) @ T_b
    w = so3_log(dT[..., :3, :3])
    return jnp.linalg.norm(w, axis=-1), jnp.linalg.norm(dT[..., :3, 3], axis=-1)
