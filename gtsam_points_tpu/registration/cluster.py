"""Source-side voxel clustering: the probe-DEDUP lever of the batched
registration hot path.

The registration probe costs per-GATHER (one bucket-row gather per probed
point, ~2.5 ns each on v5e), and a 25k-point scan maps onto only ~5k
distinct leaf-1.0 voxels — so probing every point re-gathers each voxel's
record ~5x per iteration. Clustering the SOURCE cloud by a voxel grid once
per frame (pose-independent, so it lives in preprocessing next to
covariance estimation, NOT in the per-iteration loop) collapses the probe
volume from points to distinct source cells:

  cluster = (centroid, fused covariance = intra-cell scatter + mean member
             covariance, weight = point count)

and the unary VGICP linearize consumes clusters exactly like points with
the weight folded multiplicatively into the mask lane (every accumulated
quantity — H, b, error, inlier count — is linear in the mask value, see
ops/pallas_linearize._unary_quantities).

Approximation contract: within a cluster, the first-moment (b-vector)
contribution is exact for the translation block and exact to the centroid
for the rotation block whenever all cluster members share the target voxel
(sum_i skew(p_i) = n skew(centroid)); the H second-moment terms use the
centroid outer product instead of E[pp^T] (a Gauss-Newton scaling, not a
fixed-point shift). Accuracy is gated on-device by bench.py's convergence
check against ground truth, same bounds as the point path.

This is the TPU answer to the reference's one-launch batched fan-in
(reference: src/gtsam_points/cuda/nonlinear_factor_set_gpu.cpp:60-190) —
instead of batching factor launches, shrink each factor's probe set to its
information content. The source-voxelized objective itself mirrors the
reference's voxelized-target VGICP (types/gaussian_voxelmap_cpu.hpp)
applied symmetrically to the source.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.ops.voxelmap import GaussianVoxelMap, _scan_moments
from gtsam_points_tpu.registration.pyramid import PyramidStage
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.solve6 import solve6


class SourceClusters(NamedTuple):
    """Per-voxel aggregation of a source scan, planar layout (lane axis = C).

    pts_p:  [3, C] cluster centroids (source frame)
    covs6:  [6, C] fused cluster covariance (upper-triangular sym packing):
            intra-cell point scatter + mean member covariance (exact when the
            frame has covs — point_moments folds them into the second moment)
    weight: [C] f32 member count (0 on padding slots)
    mask:   [C] bool valid-cluster flag (valid slots are compacted first —
            keys sort ascending and INVALID_KEY is int32 max)
    """

    pts_p: jax.Array
    covs6: jax.Array
    weight: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.mask.shape[0]

    def strided(self, stride: int) -> "SourceClusters":
        """Fixed-stride subset (clusters are key-sorted, so a stride walks
        the space roughly uniformly — same trick as the point stride ladder)."""
        if stride <= 1:
            return self
        return SourceClusters(
            pts_p=self.pts_p[:, ::stride],
            covs6=self.covs6[:, ::stride],
            weight=self.weight[::stride],
            mask=self.mask[::stride],
        )


# Robust coarse-to-fine cluster schedule, chosen by the round-5 on-device
# robustness sweep (1024 random +-0.1-twist inits x kitti_07 protocol on
# v5e): worst lane 0.0053 m / 0.00043 rad at ~8400 frames/s/chip. The THIRD
# leaf-4.0 iteration is what buys robustness — with only two, ~1 in 500
# inits leaves a lane at ~0.1-0.2 m (basin capture, not refinement, is the
# binding constraint). Cluster leaf 1.0, capacity 5632 (a 25k-point kitti
# scan occupies ~5.2k leaf-1.0 cells).
DEFAULT_CLUSTER_STAGES = (
    PyramidStage(4.0, 3, stride=4),
    PyramidStage(1.0, 2, stride=2),
    PyramidStage(1.0, 2, stride=1),
)

# Quality preset: one extra fine probe round on the full cluster set.
QUALITY_CLUSTER_STAGES = (
    PyramidStage(4.0, 3, stride=4),
    PyramidStage(1.0, 2, stride=2),
    PyramidStage(1.0, 3, stride=1),
)

DEFAULT_CLUSTER_LEAF = 1.0
DEFAULT_CLUSTER_CAPACITY = 5632


def cluster_source(source: Frame, leaf: float, capacity: int) -> SourceClusters:
    """Aggregate `source` into per-voxel clusters at `leaf` (one sort +
    segment-add, the same machinery as the voxel map build;
    ops/voxelmap._scan_moments). `capacity` is static; cells beyond it
    (highest packed keys) are dropped — size it generously (a 25k-point
    kitti scan occupies ~5.2k leaf-1.0 cells).

    The returned covariances are the EXACT raw cluster moments (no
    regularization) so insert_clusters_incremental reproduces the per-point
    map bit-for-bit on within-voxel clusters; register_clusters_pyramid
    adds its own eps when weighting (a single-point cluster of a covless
    frame has exactly-zero scatter, and the weighted linearize applies no
    eps of its own when src_covs6 is given — NaN poses otherwise, round-5
    finding)."""
    keys, mom = _scan_moments(source, jnp.float32(leaf), capacity)
    mask = keys != vk.INVALID_KEY
    cnt = mom[:, 0]
    safe = jnp.maximum(cnt, 1.0)
    mu = mom[:, 1:4] / safe[:, None]  # [C, 3]
    s6 = mom[:, 4:10] / safe[:, None]
    cov6 = jnp.stack(
        [
            s6[:, 0] - mu[:, 0] * mu[:, 0],
            s6[:, 1] - mu[:, 0] * mu[:, 1],
            s6[:, 2] - mu[:, 0] * mu[:, 2],
            s6[:, 3] - mu[:, 1] * mu[:, 1],
            s6[:, 4] - mu[:, 1] * mu[:, 2],
            s6[:, 5] - mu[:, 2] * mu[:, 2],
        ]
    )  # [6, C]
    mf = mask[None, :]
    return SourceClusters(
        pts_p=jnp.where(mf, mu.T, 0.0),
        covs6=jnp.where(mf, cov6, 0.0),
        weight=jnp.where(mask, cnt, 0.0),
        mask=mask,
    )


def insert_clusters_incremental(vmap: GaussianVoxelMap, clusters: SourceClusters, T):
    """Streaming map insert from PRE-CLUSTERED scan moments: transform each
    cluster's raw moments to the world frame EXACTLY under T
    (s1' = n·mu_w; S2' = n·(R C R^T + mu_w mu_w^T) — the parallel-axis
    identity, no approximation) and merge them through the incremental
    insert core. The dominating cost of the per-point insert is the scan
    key SORT (measured 3.7 of 3.9 ms at 25k points on v5e, round 5); this
    path sorts cluster keys instead (~5.6k rows), reusing the clustering
    already computed once per scan in preprocessing for registration.

    Intensity moments are not carried by SourceClusters; maps fed only
    through this path have zero per-voxel intensity. Reference analogue:
    the per-voxel accumulation before map update in
    types/gaussian_voxelmap_gpu.cu:211-307.

    -> (new_vmap, overflow), same contract as insert_frame_incremental."""
    from gtsam_points_tpu.ops import planar
    from gtsam_points_tpu.ops.voxelmap import _MOM_LANES, insert_rows_incremental

    R = T[:3, :3]
    mu_w = planar.transform(T, clusters.pts_p)  # [3, C]
    n = jnp.where(clusters.mask, clusters.weight, 0.0)  # [C]
    cw6 = planar.sym_rotate(R, clusters.covs6)  # [6, C]
    m0, m1, m2 = mu_w[0], mu_w[1], mu_w[2]
    s2 = jnp.stack(
        [
            cw6[0] + m0 * m0, cw6[1] + m0 * m1, cw6[2] + m0 * m2,
            cw6[3] + m1 * m1, cw6[4] + m1 * m2, cw6[5] + m2 * m2,
        ]
    )  # [6, C]
    C = clusters.capacity
    rows = jnp.zeros((C, _MOM_LANES), jnp.float32)
    rows = rows.at[:, 0].set(n)
    rows = rows.at[:, 1:4].set((n[None, :] * mu_w).T)
    rows = rows.at[:, 4:10].set((n[None, :] * s2).T)
    keys = vk.point_keys_planar(mu_w, clusters.mask, vmap.leaf)
    return insert_rows_incremental(vmap, keys, rows, C)


def register_clusters_pyramid(
    maps: Sequence[GaussianVoxelMap],
    clusters: SourceClusters,
    T0: jax.Array,
    stages: Sequence = DEFAULT_CLUSTER_STAGES,
    min_voxel_points: float = 1.0,
    damping: float = 1e-6,
    eps: float = 1e-3,
) -> jax.Array:
    """Coarse-to-fine GN registration of source CLUSTERS against the map
    pyramid — the dedup analogue of pyramid.register_scan_pyramid (same
    stage schema; `stride` strides clusters instead of points). `eps`
    regularizes the cluster covariance diagonal (clusters carry EXACT raw
    moments; a single-point cluster of a covless frame is otherwise
    singular). Fully jittable/vmappable. -> refined T [4,4]."""
    from gtsam_points_tpu.ops.pallas_linearize import (
        linearize_vgicp_unary_xla,
        probe_moments,
    )
    from gtsam_points_tpu.registration.pyramid import _norm_stages

    stages = _norm_stages(stages)
    eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], jnp.float32) * eps
    clusters = clusters._replace(covs6=clusters.covs6 + eye6[:, None])
    T = T0
    for vm, st in zip(maps, stages):
        cl = clusters.strided(st.stride)
        refresh = st.refresh if st.refresh > 0 else st.iters
        base_iters, extra_rounds = divmod(st.iters, refresh)

        def gn_body(i, carry, vm=vm, cl=cl):
            T, momT, found = carry
            lin = linearize_vgicp_unary_xla(
                cl.pts_p,
                momT,
                found,
                T,
                min_voxel_points,
                src_covs6=cl.covs6,
                weights=cl.weight,
            )
            H = lin.H_ss + damping * jnp.eye(6)
            xi = solve6(H, lin.b_s)
            return (T @ se3.se3_exp(xi), momT, found)

        for r in range(refresh):
            momT, found = probe_moments(vm, cl.pts_p, cl.mask, T)
            n_it = base_iters + (1 if r < extra_rounds else 0)
            T, _, _ = jax.lax.fori_loop(0, n_it, gn_body, (T, momT, found))
    return T
