"""Coarse-to-fine VGICP pyramid registration — the production fast path.

A fixed-iteration Gauss-Newton schedule over a pyramid of Gaussian voxel
maps (coarse leaves convexify the basin; the fine leaf sharpens the
optimum). Fully jittable and vmappable: fixed shapes, fori_loops, and two
TPU-shaped cost levers (round 4, measured on v5e):

1. STRIDED SOURCES. The voxel probe (1 row-gather per point) costs
   per-GATHER, not per-byte, and dominates the batched iteration (12 of
   15.7 ms at B=64) — so early stages register a fixed-stride subset of
   the source and only the final polish uses the full cloud. A leaf-4.0
   map cannot resolve detail below ~4 m anyway (stride 8 keeps ~3 k points
   over ~1.5 k voxels), and the sweep shows the stride ladder
   8 -> 4 -> 2 -> 1 matches the full-resolution optimum to < 0.02 m.
2. MATMUL SLOT-SELECT in the probe (ops/pallas_linearize.probe_moments):
   the gathered bucket rows stay dense on their 128-lane axis and the
   record select runs as two 0/1 matmuls instead of an [N,8,16]
   mask-weighted sum (batched probe 12.2 -> ~8 ms at B=64).

(Stage-frozen correspondence CACHING was tried and rejected: GN against a
stage-frozen probe converges to the frozen objective's offset optimum —
worst lane 0.8 m vs 0.008 m on the sweep. See PyramidStage.refresh.)

The per-iteration kernel is the unary (source-block-only) linearize —
`linearize_vgicp_unary_xla` by default (fastest batched path on v5e: the
batch axis keeps the VPU dense), or the Pallas unary kernel via
`use_pallas=True` (fastest single-lane path; bench.py races both).

Why not LM: a vmapped while_loop LM runs every lane until the slowest lane
converges (data-dependent), and plain single-level GN loses lanes whose
perturbed init falls outside the fine basin; the pyramid converges a wider
basin in fewer, fixed iterations (on-device sweeps, rounds 3-4). For
odometry with good motion-model inits the single-level LM (optim/lm.py)
remains the right tool; the pyramid is for wide/batched inits —
relocalization verification, multi-hypothesis tracking, RANSAC refinement.

No direct reference counterpart (the reference registers single-threaded
with LM from one init); the capability it serves is the reference's
`IntegratedVGICPFactor` + LM path batched the way a TPU wants.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.pallas_linearize import (
    linearize_vgicp_unary,
    linearize_vgicp_unary_xla,
    probe_moments,
)
from gtsam_points_tpu.ops.voxelmap import GaussianVoxelMap, build_voxelmap
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.solve6 import solve6


class PyramidStage(NamedTuple):
    """One coarse-to-fine stage: voxel `leaf` size, `iters` GN iterations,
    source subsampling `stride` (1 = all points), and `refresh` = number of
    correspondence probes in the stage (iters split evenly between probes).
    refresh=0 (default) probes EVERY iteration — the round-4 sweep showed
    stage-frozen correspondences converge to the frozen objective's offset
    optimum (worst lane 0.8 m vs 0.008 m), mirroring why the reference only
    caches under a small pose-change tolerance
    (factors/impl/integrated_icp_factor_impl.hpp:128-143); explicit
    refresh>=1 remains available for near-converged workloads."""

    leaf: float
    iters: int
    stride: int = 1
    refresh: int = 0


# Stride-pyramid schedule chosen by an on-device sweep (24 seeds x B=64 on
# the kitti_07 protocol, v5e): coarse basin capture on a stride-8 subset,
# fine refinement at stride 4 -> 2 -> full resolution. Worst lane 0.019 m /
# 0.0007 rad vs ground truth (reference bounds 0.15 m / 0.015 rad) at
# 2787 frames/s/chip. QUALITY_STAGES trades ~40%% throughput for a 0.008 m
# worst lane (identical to probing every level at full resolution).
DEFAULT_STAGES: Tuple[PyramidStage, ...] = (
    PyramidStage(4.0, 2, stride=8),
    PyramidStage(1.0, 2, stride=4),
    PyramidStage(1.0, 1, stride=2),
    PyramidStage(1.0, 1, stride=1),
)

QUALITY_STAGES: Tuple[PyramidStage, ...] = (
    PyramidStage(4.0, 2, stride=4),
    PyramidStage(2.0, 1, stride=2),
    PyramidStage(1.0, 2, stride=2),
    PyramidStage(1.0, 2, stride=1),
)

StageSpec = Union[PyramidStage, Tuple[float, int]]


def _norm_stages(stages: Sequence[StageSpec]) -> Tuple[PyramidStage, ...]:
    """Accept legacy (leaf, iters) pairs alongside PyramidStage."""
    return tuple(s if isinstance(s, PyramidStage) else PyramidStage(*s) for s in stages)


def build_pyramid(
    target: Frame, stages: Sequence[StageSpec] = DEFAULT_STAGES
) -> Tuple[GaussianVoxelMap, ...]:
    """Build one voxel map per stage, coarse to fine."""
    return tuple(build_voxelmap(target, s.leaf) for s in _norm_stages(stages))


def _source_planar(source: Frame):
    pts_p = source.points.T
    covs6 = None
    if source.covs is not None:
        c = source.covs
        covs6 = jnp.stack(
            [c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]]
        )
    return pts_p, covs6


def register_scan_pyramid(
    maps: Sequence[GaussianVoxelMap],
    source: Frame,
    T0: jax.Array,
    stages: Sequence[StageSpec] = DEFAULT_STAGES,
    min_voxel_points: float = 1.0,
    damping: float = 1e-6,
    use_pallas: bool = False,
) -> jax.Array:
    """Register `source` against the pyramid from initial pose T0 [4,4].

    `maps` from build_pyramid (aligned with `stages`); uses GICP fused
    covariances when `source.covs` is present, eps-regularized
    point-to-distribution otherwise. Wrap in jax.vmap over T0 for batched
    multi-hypothesis registration. -> refined T [4, 4]."""
    stages = _norm_stages(stages)
    pts_all, covs_all = _source_planar(source)
    mask_all = source.mask
    lin_fn = linearize_vgicp_unary if use_pallas else linearize_vgicp_unary_xla
    T = T0
    for vm, st in zip(maps, stages):
        pts = pts_all[:, :: st.stride]
        covs6 = None if covs_all is None else covs_all[:, :: st.stride]
        mask = mask_all[:: st.stride]
        refresh = st.refresh if st.refresh > 0 else st.iters
        # distribute iters over the probe rounds WITHOUT exceeding the
        # declared schedule: the first (iters % refresh) rounds run one extra
        # GN iteration instead of rounding every round up (advisor finding,
        # r4: iters=3, refresh=2 must run 2+1, not 2+2)
        base_iters, extra_rounds = divmod(st.iters, refresh)

        def gn_body(i, carry, vm=vm, pts=pts, covs6=covs6):
            T, momT, found = carry
            lin = lin_fn(pts, momT, found, T, min_voxel_points, src_covs6=covs6)
            H = lin.H_ss + damping * jnp.eye(6)
            xi = solve6(H, lin.b_s)
            return (T @ se3.se3_exp(xi), momT, found)

        for r in range(refresh):
            momT, found = probe_moments(vm, pts, mask, T)
            n_it = base_iters + (1 if r < extra_rounds else 0)
            T, _, _ = jax.lax.fori_loop(0, n_it, gn_body, (T, momT, found))
    return T


def register_pair_pyramid(
    target: Frame,
    source: Frame,
    T0: Optional[jax.Array] = None,
    stages: Sequence[StageSpec] = DEFAULT_STAGES,
    min_voxel_points: float = 1.0,
) -> jax.Array:
    """One-call pair registration (builds the pyramid internally; for repeated
    sources against one target, build_pyramid once and call
    register_scan_pyramid)."""
    stages = _norm_stages(stages)
    maps = build_pyramid(target, stages)
    if T0 is None:
        T0 = jnp.eye(4, dtype=jnp.float32)
    return register_scan_pyramid(maps, source, T0, stages, min_voxel_points)
