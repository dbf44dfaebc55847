import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.utils import se3


def random_xi(key, scale=1.0, n=()):
    return jax.random.normal(key, n + (6,)) * scale


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    xi = random_xi(key, scale=0.8, n=(64,))
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(xi, xi2, atol=2e-5)


def test_exp_small_angle():
    xi = jnp.array([1e-9, -1e-9, 0.0, 0.1, 0.2, 0.3])
    T = se3.se3_exp(xi)
    np.testing.assert_allclose(T[:3, :3], jnp.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [0.1, 0.2, 0.3], atol=1e-6)


def test_rotation_orthonormal():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (128, 3)) * 2.0
    R = se3.so3_exp(w)
    should_eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(should_eye, jnp.broadcast_to(jnp.eye(3), (128, 3, 3)), atol=1e-5)
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(det, jnp.ones(128), atol=1e-5)


def test_log_near_pi():
    axis = jnp.array([1.0, 2.0, -0.5])
    axis = axis / jnp.linalg.norm(axis)
    for theta in [3.0, 3.1, np.pi - 1e-4]:
        R = se3.so3_exp(axis * theta)
        w = se3.so3_log(R)
        np.testing.assert_allclose(np.abs(w), np.abs(axis * theta), atol=2e-3)
        # same rotation either way
        R2 = se3.so3_exp(w)
        np.testing.assert_allclose(R, R2, atol=1e-4)


def test_inverse_compose():
    key = jax.random.PRNGKey(2)
    xi = random_xi(key, n=(8,))
    T = se3.se3_exp(xi)
    eye = se3.se3_inverse(T) @ T
    np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(4), (8, 4, 4)), atol=1e-5)


def test_quat_roundtrip():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (32, 3))
    R = se3.so3_exp(w)
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_adjoint_identity():
    """Ad(T) xi == log(T exp(xi) T^-1) for small xi."""
    key = jax.random.PRNGKey(4)
    T = se3.se3_exp(random_xi(key))
    xi = jnp.array([0.01, -0.02, 0.015, 0.03, -0.01, 0.02])
    lhs = se3.adjoint(T) @ xi
    rhs = se3.se3_log(T @ se3.se3_exp(xi) @ se3.se3_inverse(T))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_transform_points():
    T = se3.se3_exp(jnp.array([0.1, 0.2, 0.3, 1.0, 2.0, 3.0]))
    pts = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    out = se3.transform_points(T, pts)
    hom = jnp.concatenate([pts, jnp.ones((16, 1))], axis=1)
    expected = (T @ hom.T).T[:, :3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_left_jacobian_inverse():
    key = jax.random.PRNGKey(6)
    w = jax.random.normal(key, (16, 3))
    J = se3.so3_left_jacobian(w)
    Jinv = se3.so3_left_jacobian_inv(w)
    np.testing.assert_allclose(J @ Jinv, jnp.broadcast_to(jnp.eye(3), (16, 3, 3)), atol=1e-4)


def test_solve6_matches_cho_solve():
    """utils/solve6 unrolled Cholesky vs jax.scipy cho_solve oracle, batched
    and single, on random SPD systems."""
    import jax
    import jax.scipy.linalg as jsl

    from gtsam_points_tpu.utils.solve6 import solve6

    rng = np.random.RandomState(3)
    A = rng.randn(8, 6, 6).astype(np.float32)
    H = A @ np.transpose(A, (0, 2, 1)) + 3.0 * np.eye(6, dtype=np.float32)
    b = rng.randn(8, 6).astype(np.float32)
    got = np.asarray(jax.jit(solve6)(jnp.asarray(H), jnp.asarray(b)))
    for i in range(8):
        want = np.asarray(
            jsl.cho_solve(jsl.cho_factor(jnp.asarray(H[i]), lower=True), jnp.asarray(b[i]))
        )
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)
    # single (unbatched) call
    got1 = np.asarray(solve6(jnp.asarray(H[0]), jnp.asarray(b[0])))
    np.testing.assert_allclose(got1, got[0], rtol=1e-6)
