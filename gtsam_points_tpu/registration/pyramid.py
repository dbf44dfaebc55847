"""Coarse-to-fine VGICP pyramid registration — the production fast path.

A fixed-iteration Gauss-Newton schedule over a pyramid of Gaussian voxel
maps (coarse leaves convexify the basin; the fine leaf sharpens the
optimum). Fully jittable and vmappable: fixed shapes, one fori_loop per
level, the moments-fused Pallas linearize as the hot kernel — this is
exactly the program bench.py's headline measures (654 frames/s/chip at
B=64 on TPU v5e, every one of 1024 sweep registrations within 0.008 m of
ground truth on the kitti_07 protocol).

Why not LM: a vmapped while_loop LM runs every lane until the slowest lane
converges (data-dependent), and plain single-level GN loses lanes whose
perturbed init falls outside the fine basin; the pyramid converges a wider
basin in fewer, fixed iterations (on-device sweep, round 3). For odometry
with good motion-model inits the single-level LM (optim/lm.py) remains the
right tool; the pyramid is for wide/batched inits — relocalization
verification, multi-hypothesis tracking, RANSAC refinement.

No direct reference counterpart (the reference registers single-threaded
with LM from one init); the capability it serves is the reference's
`IntegratedVGICPFactor` + LM path batched the way a TPU wants.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.pallas_linearize import vgicp_scan_linearize
from gtsam_points_tpu.ops.voxelmap import GaussianVoxelMap, build_voxelmap
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3

DEFAULT_STAGES: Tuple[Tuple[float, int], ...] = ((4.0, 2), (2.0, 1), (1.0, 4))


def build_pyramid(
    target: Frame, stages: Sequence[Tuple[float, int]] = DEFAULT_STAGES
) -> Tuple[GaussianVoxelMap, ...]:
    """Build one voxel map per (leaf, iters) stage, coarse to fine."""
    return tuple(build_voxelmap(target, leaf) for leaf, _ in stages)


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
    stages: Sequence[Tuple[float, int]] = DEFAULT_STAGES,
    min_voxel_points: float = 1.0,
    damping: float = 1e-6,
) -> jax.Array:
    """Register `source` against the pyramid from initial pose T0 [4,4].

    `maps` from build_pyramid (aligned with `stages`); uses GICP fused
    covariances when `source.covs` is present, eps-regularized
    point-to-distribution otherwise. Wrap in jax.vmap over T0 for batched
    multi-hypothesis registration. -> refined T [4, 4]."""
    pts_p, covs6 = _source_planar(source)
    mask = source.mask
    T = T0
    for vm, (_, iters) in zip(maps, stages):

        def body(i, T, vm=vm):
            lin = vgicp_scan_linearize(
                vm, pts_p, mask, T, min_voxel_points, src_covs6=covs6
            )
            H = lin.H_ss + damping * jnp.eye(6)
            xi = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(H, lower=True), lin.b_s
            )
            return T @ se3.se3_exp(xi)

        T = jax.lax.fori_loop(0, iters, body, T)
    return T


def register_pair_pyramid(
    target: Frame,
    source: Frame,
    T0: Optional[jax.Array] = None,
    stages: Sequence[Tuple[float, int]] = DEFAULT_STAGES,
    min_voxel_points: float = 1.0,
) -> jax.Array:
    """One-call pair registration (builds the pyramid internally; for repeated
    sources against one target, build_pyramid once and call
    register_scan_pyramid)."""
    maps = build_pyramid(target, stages)
    if T0 is None:
        T0 = jnp.eye(4, dtype=jnp.float32)
    return register_scan_pyramid(maps, source, T0, stages, min_voxel_points)
