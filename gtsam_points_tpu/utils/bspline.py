"""Cubic B-spline pose interpolation + continuous trajectory.

Reference: util/bspline.hpp:22-151 (bspline, bspline_se3/so3/trans, velocity /
acceleration / imu expressions) and util/continuous_trajectory.hpp:21-95
(knot trajectory, fit_knots). The reference builds these as GTSAM expression
trees with hand derivatives; here they are plain differentiable functions —
AD supplies every derivative, including the angular-velocity / acceleration /
IMU outputs, and fit_knots is a batched LM problem over the knot poses.

Cumulative cubic B-spline (Sommer et al.): for t in [t_i, t_{i+1}) with
normalized u, using knots T_{i-1}..T_{i+2}:
  T(u) = T_{i-1} · prod_{j=1..3} Exp(B_j(u) · Log(T_{i+j-2}⁻¹ T_{i+j-1}))
  B(u) = C·[1, u, u², u³], C the cumulative cubic basis matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.utils import se3

# cumulative basis matrix (rows: B_1..B_3 coefficients of [1, u, u^2, u^3])
_C = jnp.asarray(
    [
        [5.0 / 6.0, 3.0 / 6.0, -3.0 / 6.0, 1.0 / 6.0],
        [1.0 / 6.0, 3.0 / 6.0, 3.0 / 6.0, -2.0 / 6.0],
        [0.0, 0.0, 0.0, 1.0 / 6.0],
    ],
    dtype=jnp.float32,
)


def bspline_pose(knots: jax.Array, u: jax.Array, i: jax.Array) -> jax.Array:
    """Interpolate at normalized u in [0,1) within knot interval i.

    knots: [K, 4, 4]; uses knots[i-1 .. i+2] (callers guarantee 1 <= i <= K-3).
    Returns [..., 4, 4] for broadcast u/i of matching shape.
    """
    uv = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)  # [..., 4]
    B = uv @ _C.T  # [..., 3]
    T0 = knots[i - 1]
    d1 = se3.se3_log(se3.se3_inverse(knots[i - 1]) @ knots[i])
    d2 = se3.se3_log(se3.se3_inverse(knots[i]) @ knots[i + 1])
    d3 = se3.se3_log(se3.se3_inverse(knots[i + 1]) @ knots[i + 2])
    A1 = se3.se3_exp(B[..., 0, None] * d1)
    A2 = se3.se3_exp(B[..., 1, None] * d2)
    A3 = se3.se3_exp(B[..., 2, None] * d3)
    return T0 @ A1 @ A2 @ A3


class ContinuousTrajectory:
    """Uniform-knot B-spline trajectory over [t0, t1] (reference:
    util/continuous_trajectory.hpp:21-95)."""

    def __init__(self, knots: jax.Array, t0: float, knot_interval: float):
        self.knots = knots  # [K, 4, 4]
        self.t0 = float(t0)
        self.dt = float(knot_interval)

    @staticmethod
    def num_knots(t0: float, t1: float, knot_interval: float) -> int:
        return int(jnp.ceil((t1 - t0) / knot_interval)) + 3

    def knot_stamp(self, i) -> jax.Array:
        return self.t0 + (jnp.asarray(i, jnp.float32) - 1.0) * self.dt

    def _locate(self, t: jax.Array):
        s = (jnp.asarray(t, jnp.float32) - self.t0) / self.dt
        i = jnp.clip(jnp.floor(s).astype(jnp.int32) + 1, 1, self.knots.shape[0] - 3)
        u = s - (i - 1)
        return u, i

    def pose(self, t: jax.Array) -> jax.Array:
        u, i = self._locate(t)
        return bspline_pose(self.knots, u, i)

    def velocity(self, t: jax.Array):
        """(angular [3], linear [3]) world-frame velocities by AD through time."""

        def p(tt):
            return self.pose(tt)

        t = jnp.asarray(t, jnp.float32)
        T, dT = jax.jvp(p, (t,), (jnp.ones_like(t),))
        R = T[..., :3, :3]
        w_hat = dT[..., :3, :3] @ jnp.swapaxes(R, -1, -2)
        omega = jnp.stack([w_hat[..., 2, 1], w_hat[..., 0, 2], w_hat[..., 1, 0]], axis=-1)
        return omega, dT[..., :3, 3]

    def imu(self, t: jax.Array, gravity=(0.0, 0.0, -9.80665)):
        """Local-frame (acc, gyro) prediction (reference: bspline_imu,
        util/bspline.hpp)."""

        def vel(tt):
            def p(ttt):
                return self.pose(ttt)

            _, dT = jax.jvp(p, (tt,), (jnp.ones_like(tt),))
            return dT[..., :3, 3]

        t = jnp.asarray(t, jnp.float32)
        a_world = jax.jvp(vel, (t,), (jnp.ones_like(t),))[1]
        T = self.pose(t)
        R = T[..., :3, :3]
        g = jnp.asarray(gravity, dtype=jnp.float32)
        acc_local = jnp.einsum("...ji,...j->...i", R, a_world - g)
        omega_w, _ = self.velocity(t)
        gyro_local = jnp.einsum("...ji,...j->...i", R, omega_w)
        return acc_local, gyro_local


def fit_knots(
    stamps: jax.Array,
    poses: jax.Array,
    t0: float,
    t1: float,
    knot_interval: float,
    iterations: int = 20,
    smoothness_weight: float = 1e-2,
    dense_knot_threshold: int = 96,
) -> ContinuousTrajectory:
    """Batch-fit knot poses to timestamped pose samples with a smoothness prior
    (reference: ContinuousTrajectory::fit_knots, src/.../continuous_trajectory.cpp).
    Gauss-Newton over all knots jointly (one jitted loop).

    Small problems use a dense K*6 solve; long trajectories switch to a
    block-banded Gauss-Newton (each sample touches only its 4-knot window, so
    H has block bandwidth 3) solved by preconditioned CG with an O(K) banded
    matvec — linear time/memory in trajectory length, unlike the reference's
    dense LM over all knots."""
    K = ContinuousTrajectory.num_knots(t0, t1, knot_interval)
    # init: nearest sample pose per knot
    init_idx = jnp.clip(
        jnp.searchsorted(stamps, t0 + (jnp.arange(K) - 1) * knot_interval), 0, len(stamps) - 1
    )
    knots0 = poses[init_idx]
    if K > dense_knot_threshold:
        knots = _fit_knots_banded(
            jnp.asarray(stamps), jnp.asarray(poses), float(t0), float(knot_interval),
            K, knots0, iterations, smoothness_weight,
        )
        return ContinuousTrajectory(knots, t0, knot_interval)

    def residuals(knots):
        traj = ContinuousTrajectory(knots, t0, knot_interval)
        pred = traj.pose(stamps)
        r_fit = se3.se3_log(se3.se3_inverse(pred) @ poses).reshape(-1)
        d = se3.se3_log(se3.se3_inverse(knots[:-1]) @ knots[1:])
        r_smooth = (d[1:] - d[:-1]).reshape(-1) * smoothness_weight
        return jnp.concatenate([r_fit, r_smooth])

    @jax.jit
    def solve(knots0):
        def body(_, knots):
            def at(xi):
                return residuals(knots @ se3.se3_exp(xi.reshape(K, 6)))

            zero = jnp.zeros((K * 6,), jnp.float32)
            r0 = at(zero)
            J = jax.jacfwd(at)(zero)
            H = J.T @ J + 1e-6 * jnp.eye(K * 6, dtype=jnp.float32)
            delta = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H, lower=True), -(J.T @ r0))
            delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, 0.0)
            return knots @ se3.se3_exp(delta.reshape(K, 6))

        return jax.lax.fori_loop(0, iterations, body, knots0)

    return ContinuousTrajectory(solve(knots0), t0, knot_interval)


def _window_pose(knots4: jax.Array, u: jax.Array) -> jax.Array:
    """Cumulative B-spline pose from an explicit 4-knot window [4,4,4]."""
    uv = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)
    B = uv @ _C.T
    d1 = se3.se3_log(se3.se3_inverse(knots4[0]) @ knots4[1])
    d2 = se3.se3_log(se3.se3_inverse(knots4[1]) @ knots4[2])
    d3 = se3.se3_log(se3.se3_inverse(knots4[2]) @ knots4[3])
    return (
        knots4[0]
        @ se3.se3_exp(B[..., 0, None] * d1)
        @ se3.se3_exp(B[..., 1, None] * d2)
        @ se3.se3_exp(B[..., 2, None] * d3)
    )


def _band_matvec(Hb: jax.Array, x: jax.Array) -> jax.Array:
    """y[k] = sum_o Hb[k, o] @ x[k + o - 3] for block-banded H ([K,7,6,6])."""
    K = x.shape[0]
    xp = jnp.pad(x, ((3, 3), (0, 0)))
    xs = jnp.stack([jax.lax.dynamic_slice_in_dim(xp, o, K, axis=0) for o in range(7)], axis=1)
    return jnp.einsum("koij,koj->ki", Hb, xs)


def _fit_knots_banded(stamps, poses, t0, dt, K, knots0, iterations, w_smooth, cg_iters=120):
    """Banded GN fit: scatter per-sample 24x24 window Hessians into a [K,7,6,6]
    block band, solve with block-Jacobi-preconditioned CG."""
    s = (stamps - t0) / dt
    iv = jnp.clip(jnp.floor(s).astype(jnp.int32) + 1, 1, K - 3)
    u = s - (iv - 1).astype(jnp.float32)
    base = iv - 1  # [S]
    a_idx = jnp.arange(4, dtype=jnp.int32)
    off_ab = a_idx[None, :] - a_idx[:, None] + 3  # [4,4] offset of block (a,b)

    def sample_Jr(knots, b0, uu, Ts):
        k4 = knots[b0 + a_idx]

        def at(xi):
            return se3.se3_log(
                se3.se3_inverse(_window_pose(k4 @ se3.se3_exp(xi.reshape(4, 6)), uu)) @ Ts
            )

        zero = jnp.zeros((24,), jnp.float32)
        return at(zero), jax.jacfwd(at)(zero)  # [6], [6,24]

    def smooth_Jr(knots, j):
        # r_j = (Log(K[j+1]^-1 K[j+2]) - Log(K[j]^-1 K[j+1])) * w over window (j, j+1, j+2)
        k3 = knots[j + a_idx[:3]]

        def at(xi):
            k = k3 @ se3.se3_exp(xi.reshape(3, 6))
            d1 = se3.se3_log(se3.se3_inverse(k[0]) @ k[1])
            d2 = se3.se3_log(se3.se3_inverse(k[1]) @ k[2])
            return (d2 - d1) * w_smooth

        zero = jnp.zeros((18,), jnp.float32)
        return at(zero), jax.jacfwd(at)(zero)  # [6], [6,18]

    sm_base = jnp.arange(K - 2, dtype=jnp.int32)

    def build_system(knots):
        r, J = jax.vmap(sample_Jr, in_axes=(None, 0, 0, 0))(knots, base, u, poses)
        Jb = J.reshape(-1, 6, 4, 6)  # [S,6,4,6]
        Hs = jnp.einsum("siaj,sibk->sabjk", Jb, Jb)  # [S,4,4,6,6]
        bs = -jnp.einsum("siaj,si->saj", Jb, r)  # [S,4,6]

        rows = base[:, None, None] + a_idx[None, :, None]  # [S,4,1] row knot of block (a,b)
        rows = jnp.broadcast_to(rows, Hs.shape[:3])
        offs = jnp.broadcast_to(off_ab[None], Hs.shape[:3])
        Hb = jnp.zeros((K, 7, 6, 6), jnp.float32).at[rows, offs].add(Hs)
        bv = jnp.zeros((K, 6), jnp.float32).at[base[:, None] + a_idx[None, :]].add(bs)

        r2, J2 = jax.vmap(smooth_Jr, in_axes=(None, 0))(knots, sm_base)
        J2b = J2.reshape(-1, 6, 3, 6)
        Hs2 = jnp.einsum("siaj,sibk->sabjk", J2b, J2b)
        bs2 = -jnp.einsum("siaj,si->saj", J2b, r2)
        rows2 = sm_base[:, None, None] + a_idx[None, :3, None]
        rows2 = jnp.broadcast_to(rows2, Hs2.shape[:3])
        offs2 = jnp.broadcast_to(off_ab[None, :3, :3], Hs2.shape[:3])
        Hb = Hb.at[rows2, offs2].add(Hs2)
        bv = bv.at[sm_base[:, None] + a_idx[None, :3]].add(bs2)
        return Hb, bv

    eye6 = jnp.eye(6, dtype=jnp.float32)

    def cg(Hb, bv):
        Minv = jnp.linalg.inv(Hb[:, 3] + 1e-5 * eye6)

        def prec(v):
            return jnp.einsum("kij,kj->ki", Minv, v)

        x = jnp.zeros_like(bv)
        rr = bv
        z = prec(rr)
        p = z
        rz = jnp.sum(rr * z)

        def body(_, carry):
            x, rr, p, rz = carry
            Hp = _band_matvec(Hb, p)
            alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-20)
            x = x + alpha * p
            rr2 = rr - alpha * Hp
            z2 = prec(rr2)
            rz2 = jnp.sum(rr2 * z2)
            beta = rz2 / jnp.maximum(rz, 1e-20)
            return x, rr2, z2 + beta * p, rz2

        x, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x, rr, p, rz))
        return x

    @jax.jit
    def solve(knots0):
        def body(_, knots):
            Hb, bv = build_system(knots)
            Hb = Hb.at[:, 3].add(1e-4 * eye6)  # damping
            delta = cg(Hb, bv)
            delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
            return knots @ se3.se3_exp(delta)

        return jax.lax.fori_loop(0, iterations, body, knots0)

    return solve(knots0)
