"""Batched factor sets: F homogeneous matching factors evaluated by ONE vmapped
kernel and scattered into the graph system with vectorized index-adds.

This is the TPU realization of the reference's NonlinearFactorSetGPU batched
linearization (src/gtsam_points/cuda/nonlinear_factor_set_gpu.cpp:60-190): all
factor inputs live in stacked arrays [F, ...], the whole set linearizes in one
fused launch, and the per-factor 6x6 blocks accumulate into the dense system
via scatter-add. The factor axis (and the per-point axis inside each factor)
shard across a jax.sharding Mesh — the cross-device reduction of the block
system is a psum inserted by XLA (see parallel/distributed.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import register_factor
from gtsam_points_tpu.factors.linearized import inv3x3, reduce_system
from gtsam_points_tpu.ops.voxelmap import GaussianVoxelMap, lookup_fetch, lookup_voxels
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3


@dataclasses.dataclass(frozen=True)
class VGICPFactorBatch:
    """F VGICP factors with stacked inputs.

    voxelmaps: GaussianVoxelMap pytree with leading [F] axis on every leaf
    sources:   Frame pytree with leading [F] axis
    target_keys/source_keys: [F] int32 pose indices (target_key < 0 -> unary
               with identity fixed target)
    """

    voxelmaps: GaussianVoxelMap
    sources: Frame
    target_keys: jax.Array
    source_keys: jax.Array
    min_voxel_points: float

    @property
    def keys(self):
        # dynamic keys: report nothing static; graph uses add_to_system
        return ()

    def num_factors(self) -> int:
        return self.sources.points.shape[0]

    def _planar_one(self, vmap: GaussianVoxelMap, source: Frame, T_t, T_s):
        """Frozen planar closure at (T_t, T_s): -> (pts_p, pm, mu, W6, found,
        delta). Same analytic fast path as VGICPFactor (ops/planar.py)."""
        from gtsam_points_tpu.ops import planar
        from gtsam_points_tpu.ops.voxelmap import lookup_fetch_planar

        pts_p = source.points.T
        delta = se3.se3_inverse(T_t) @ T_s
        pm = planar.transform(delta, pts_p)
        found, vcount, mu, C6 = lookup_fetch_planar(vmap, pm, source.mask)
        found = found & (vcount >= self.min_voxel_points)
        if source.covs is not None:
            c = source.covs
            covs6 = jnp.stack([c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]])
            fused = C6 + planar.sym_rotate(delta[:3, :3], covs6)
        else:
            eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], C6.dtype) * 1e-3
            fused = C6 + eye6[:, None]
        W6 = planar.sym_inv(fused)
        return pts_p, pm, mu, W6, found, delta

    def _linearize_one(self, vmap: GaussianVoxelMap, source: Frame, T_t, T_s):
        from gtsam_points_tpu.ops import planar

        pts_p, pm, mu, W6, found, delta = self._planar_one(vmap, source, T_t, T_s)
        return planar.linearize_point_system(pts_p, pm, pm - mu, W6, found, delta[:3, :3])

    def _resolved_poses(self, poses):
        eye = jnp.eye(4, dtype=jnp.float32)
        T_t = jnp.where(
            (self.target_keys >= 0)[:, None, None],
            poses[jnp.maximum(self.target_keys, 0)],
            eye[None],
        )
        T_s = poses[self.source_keys]
        return T_t, T_s

    def add_to_system(self, A, b, poses):
        """Scatter all factors' blocks into (A [P,P,6,6], b [P,6]); returns
        (A, b, err, frozen_error_fn)."""
        T_t, T_s = self._resolved_poses(poses)
        lin = jax.vmap(self._linearize_one)(self.voxelmaps, self.sources, T_t, T_s)

        p = A.shape[0]
        tk = jnp.where(self.target_keys >= 0, self.target_keys, p)  # p = drop row
        sk = self.source_keys
        A_ext = jnp.zeros((p + 1, p + 1, 6, 6), dtype=A.dtype)
        A_ext = A_ext.at[:p, :p].set(A)
        A_ext = A_ext.at[tk, tk].add(lin.H_tt)
        A_ext = A_ext.at[sk, sk].add(lin.H_ss)
        A_ext = A_ext.at[tk, sk].add(lin.H_ts)
        A_ext = A_ext.at[sk, tk].add(jnp.swapaxes(lin.H_ts, -1, -2))
        b_ext = jnp.zeros((p + 1, 6), dtype=b.dtype).at[:p].set(b)
        b_ext = b_ext.at[tk].add(lin.b_t)
        b_ext = b_ext.at[sk].add(lin.b_s)
        err = jnp.sum(lin.error)

        # frozen-correspondence error for the LM accept gate
        vmaps, sources, mvp = self.voxelmaps, self.sources, self.min_voxel_points

        def frozen_error(new_poses):
            nT_t, nT_s = self._resolved_poses(new_poses)

            def one(vmap, source, T_t0, T_s0, nTt, nTs):
                # recompute frozen aux at OLD poses, evaluate at new
                from gtsam_points_tpu.ops import planar

                pts_p, _, mu, W6, found, _ = self._planar_one(vmap, source, T_t0, T_s0)
                nd = se3.se3_inverse(nTt) @ nTs
                r = planar.transform(nd, pts_p) - mu
                return planar.weighted_error(r, W6, found)

            return jnp.sum(jax.vmap(one)(vmaps, sources, T_t, T_s, nT_t, nT_s))

        return A_ext[:p, :p], b_ext[:p], err, frozen_error


def _batch_error(self, poses):
    T_t, T_s = self._resolved_poses(poses)

    def one(vmap, source, Tt, Ts):
        delta = se3.se3_inverse(Tt) @ Ts
        moved = se3.transform_points(delta, source.points)
        found, vcount, mu, C_t = lookup_fetch(vmap, moved, source.mask)
        found = found & (vcount >= self.min_voxel_points)
        R = delta[:3, :3]
        if source.covs is not None:
            fused = C_t + jnp.einsum("ij,njk,lk->nil", R, source.covs, R)
        else:
            fused = C_t + 1e-3 * jnp.eye(3, dtype=C_t.dtype)
        W = inv3x3(fused)
        r = moved - mu
        return jnp.sum(jnp.einsum("ni,nij,nj->n", r, W, r) * found.astype(r.dtype))

    return jnp.sum(jax.vmap(one)(self.voxelmaps, self.sources, T_t, T_s))


VGICPFactorBatch.error = _batch_error


def make_vgicp_factor_batch(
    voxelmaps_list, sources_list, target_keys, source_keys, min_voxel_points: float = 5.0
) -> VGICPFactorBatch:
    """Stack per-factor voxelmaps/sources (all must share capacities)."""
    stacked_vm = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *voxelmaps_list)
    stacked_src = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *sources_list)
    return VGICPFactorBatch(
        voxelmaps=stacked_vm,
        sources=stacked_src,
        target_keys=jnp.asarray(target_keys, dtype=jnp.int32),
        source_keys=jnp.asarray(source_keys, dtype=jnp.int32),
        min_voxel_points=min_voxel_points,
    )


register_factor(
    VGICPFactorBatch,
    data_fields=["voxelmaps", "sources", "target_keys", "source_keys"],
    meta_fields=["min_voxel_points"],
)
