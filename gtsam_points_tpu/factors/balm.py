"""Bundle-adjustment factors: plane/edge eigenvalue minimization (BALM) and
moment-based LSQ plane BA.

Reference: PlaneEVMFactor / EdgeEVMFactor / LsqBundleAdjustmentFactor
(include/gtsam_points/factors/bundle_adjustment_factor_evm.hpp:26-104,
bundle_adjustment_factor_lsq.hpp:23-55, balm_feature.hpp:11-100).

EVM cost: points observed from multiple keyframes form one feature; the cost is
the smallest eigenvalue(s) of the scatter of the world-frame points — lambda_0
for a plane, lambda_0 + lambda_1 for an edge. Instead of the reference's
hand-derived 1st/2nd-order eigenvalue derivatives we use the standard
Gauss-Newton surrogate: freeze the eigenvector(s) v at the linearization point;
then lambda = sum_i (vᵀ(p_i - mu))²/N is a plain sum of squares and the
existing AD linearization core applies over all K involved pose keys.

LSQ variant: identical cost computed from per-frame Gaussian moments
(count, mean, cov) so evaluation is independent of the number of points
(the reference's EF-optimal-condition property).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import register_factor
from gtsam_points_tpu.ops.eigh3 import eigh3
from gtsam_points_tpu.utils import se3


def _transform_all(poses, keys_per_point, pts):
    T = poses[keys_per_point]  # [N, 4, 4]
    return jnp.einsum("nij,nj->ni", T[:, :3, :3], pts) + T[:, :3, 3]


class _EVMBase:
    """Shared multi-key EVM machinery. Subclasses set num_eigvecs."""

    @property
    def keys(self) -> Tuple[int, ...]:
        return self.pose_keys

    def _world_scatter(self, poses):
        p = _transform_all(poses, self.point_keys, self.points)
        m = self.mask.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mu = jnp.sum(p * m[:, None], axis=0) / cnt
        d = (p - mu) * m[:, None]
        S = d.T @ d / cnt
        return p, mu, S, cnt

    def _frozen_eigvecs(self, poses):
        _, _, S, _ = self._world_scatter(poses)
        _, V = eigh3(S)
        return V[:, : self.num_eigvecs]  # [3, E] smallest eigenvectors

    def _residuals(self, poses, V, sqrt_cnt):
        p = _transform_all(poses, self.point_keys, self.points)
        m = self.mask.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mu = jnp.sum(p * m[:, None], axis=0) / cnt
        r = ((p - mu) @ V) * (m[:, None] / sqrt_cnt)  # [N, E]
        return r

    def multi_linearize(self, poses):
        """-> (H [6K,6K], b [6K], err) over self.pose_keys."""
        V = self._frozen_eigvecs(poses)
        _, _, _, cnt = self._world_scatter(poses)
        sqrt_cnt = jnp.sqrt(cnt)
        K = len(self.pose_keys)
        key_arr = jnp.asarray(self.pose_keys, dtype=jnp.int32)

        def at(xi):
            perturbed = poses.at[key_arr].set(poses[key_arr] @ se3.se3_exp(xi.reshape(K, 6)))
            return self._residuals(perturbed, V, sqrt_cnt).reshape(-1)

        zero = jnp.zeros((K * 6,), jnp.float32)
        r0 = at(zero)
        J = jax.jacfwd(at)(zero)  # [N*E, 6K]
        H = J.T @ J
        b = -(J.T @ r0)
        return H, b, jnp.sum(r0 * r0)

    def error(self, poses):
        _, _, S, _ = self._world_scatter(poses)
        w, _ = eigh3(S)
        return jnp.sum(w[: self.num_eigvecs])


@dataclasses.dataclass(frozen=True)
class PlaneEVMFactor(_EVMBase):
    """Minimize lambda_0 of the feature scatter (plane flatness)."""

    points: jax.Array  # [N, 3] in their keyframes' local coords
    point_keys: jax.Array  # [N] int32 pose index per point
    mask: jax.Array  # [N]
    pose_keys: Tuple[int, ...]
    num_eigvecs: int = 1


@dataclasses.dataclass(frozen=True)
class EdgeEVMFactor(_EVMBase):
    """Minimize lambda_0 + lambda_1 (collapse scatter onto a line)."""

    points: jax.Array
    point_keys: jax.Array
    mask: jax.Array
    pose_keys: Tuple[int, ...]
    num_eigvecs: int = 2


def make_evm_factor(kind: str, points_per_key: dict, capacity_multiple: int = 64):
    """points_per_key: {pose_key: [Ni, 3] array} — the reference's
    EVMBundleAdjustmentFactorBase::add(pt, key) accumulation."""
    import numpy as np

    keys = tuple(sorted(points_per_key))
    pts = np.concatenate([np.asarray(points_per_key[k], dtype=np.float32) for k in keys])
    pk = np.concatenate([np.full((len(points_per_key[k]),), k, dtype=np.int32) for k in keys])
    n = len(pts)
    cap = ((n + capacity_multiple - 1) // capacity_multiple) * capacity_multiple
    mask = np.zeros((cap,), dtype=bool)
    mask[:n] = True
    pad = cap - n
    pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    pk = np.concatenate([pk, np.zeros((pad,), np.int32)])
    cls = PlaneEVMFactor if kind == "plane" else EdgeEVMFactor
    return cls(points=jnp.asarray(pts), point_keys=jnp.asarray(pk), mask=jnp.asarray(mask), pose_keys=keys)


@dataclasses.dataclass(frozen=True)
class LsqBAFactor:
    """Plane BA on per-frame Gaussian moments: cost = lambda_0 of the fused
    world-frame scatter of the per-frame (count, mean, cov) summaries —
    independent of the raw point count (reference: LsqBundleAdjustmentFactor,
    factors/bundle_adjustment_factor_lsq.hpp:23-55)."""

    counts: jax.Array  # [K]
    means: jax.Array  # [K, 3] local
    covs: jax.Array  # [K, 3, 3] local
    pose_keys: Tuple[int, ...]

    @property
    def keys(self):
        return self.pose_keys

    def _fused(self, poses):
        key_arr = jnp.asarray(self.pose_keys, dtype=jnp.int32)
        T = poses[key_arr]
        R = T[:, :3, :3]
        mu_w = jnp.einsum("kij,kj->ki", R, self.means) + T[:, :3, 3]
        cov_w = jnp.einsum("kij,kjl,kml->kim", R, self.covs, R)
        w = self.counts / jnp.maximum(jnp.sum(self.counts), 1.0)
        mu_g = jnp.sum(mu_w * w[:, None], axis=0)
        d = mu_w - mu_g
        S = jnp.sum(w[:, None, None] * (cov_w + jnp.einsum("ki,kj->kij", d, d)), axis=0)
        return mu_w, cov_w, mu_g, S, w

    def multi_linearize(self, poses):
        _, _, _, S, _ = self._fused(poses)
        _, V = eigh3(S)
        v = V[:, 0]  # frozen plane normal
        K = len(self.pose_keys)
        key_arr = jnp.asarray(self.pose_keys, dtype=jnp.int32)

        def at(xi):
            perturbed = poses.at[key_arr].set(poses[key_arr] @ se3.se3_exp(xi.reshape(K, 6)))
            mu_w, cov_w, mu_g, _, w = self._fused(perturbed)
            # lambda_0 ≈ sum_k w_k [ (vᵀ(mu_k - mu_g))² + vᵀ C_k v ]; residual form
            r_mean = jnp.sqrt(w) * ((mu_w - mu_g) @ v)
            r_cov = jnp.sqrt(jnp.maximum(jnp.einsum("i,kij,j->k", v, cov_w, v) * w, 1e-12))
            return jnp.concatenate([r_mean, r_cov])

        zero = jnp.zeros((K * 6,), jnp.float32)
        r0 = at(zero)
        J = jax.jacfwd(at)(zero)
        H = J.T @ J
        b = -(J.T @ r0)
        return H, b, jnp.sum(r0 * r0)

    def error(self, poses):
        _, _, _, S, _ = self._fused(poses)
        w, _ = eigh3(S)
        return w[0]


def make_lsq_ba_factor(moments_per_key: dict):
    """moments_per_key: {pose_key: (count, mean [3], cov [3,3])}."""
    import numpy as np

    keys = tuple(sorted(moments_per_key))
    counts = jnp.asarray([float(moments_per_key[k][0]) for k in keys], dtype=jnp.float32)
    means = jnp.asarray(np.stack([np.asarray(moments_per_key[k][1]) for k in keys]), dtype=jnp.float32)
    covs = jnp.asarray(np.stack([np.asarray(moments_per_key[k][2]) for k in keys]), dtype=jnp.float32)
    return LsqBAFactor(counts=counts, means=means, covs=covs, pose_keys=keys)


register_factor(PlaneEVMFactor, data_fields=["points", "point_keys", "mask"], meta_fields=["pose_keys", "num_eigvecs"])
register_factor(EdgeEVMFactor, data_fields=["points", "point_keys", "mask"], meta_fields=["pose_keys", "num_eigvecs"])
register_factor(LsqBAFactor, data_fields=["counts", "means", "covs"], meta_fields=["pose_keys"])
