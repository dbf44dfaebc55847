"""Region-growing segmentation.

Reference: region_growing_init/step/update (include/gtsam_points/segmentation/region_growing.hpp:17-100,
segmentation/impl/region_growing_impl.hpp). A seed point grows over the kNN
graph where neighbors are within a distance threshold and normals agree within
an angle threshold. TPU design: the BFS becomes synchronous label propagation —
each lax.while_loop step expands the frontier through the precomputed [N, k]
neighbor table until no label changes (the reference's incremental step_/update_
API maps to running a bounded number of propagation steps per call).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.hash_grid import build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame


@dataclasses.dataclass(frozen=True)
class RegionGrowingParams:
    k: int = 10
    distance_thresh: float = 0.5
    angle_thresh: float = 0.3  # radians between normals
    max_steps: int = 256
    dilation_steps: int = 1  # final distance-only dilation pass
    grid_leaf: float = 0.5


def region_growing(frame: Frame, seed_point: jax.Array, params: Optional[RegionGrowingParams] = None) -> jax.Array:
    """-> [N] bool cluster mask containing the seed point."""
    p = params or RegionGrowingParams()
    if frame.normals is None:
        raise ValueError("region growing requires normals")
    grid = build_hash_grid(frame.points, frame.mask, p.grid_leaf)
    nn_idx, nn_sq, nn_valid = knn_search(
        grid, frame.points, frame.mask, p.k, max_sq_dist=p.distance_thresh**2
    )
    idx = jnp.maximum(nn_idx, 0)
    # edge admissibility: distance (already bounded) + normal agreement
    cos_thresh = jnp.cos(p.angle_thresh)
    n_i = frame.normals[:, None, :]
    n_j = frame.normals[idx]
    edge_ok = nn_valid & (jnp.abs(jnp.sum(n_i * n_j, axis=-1)) >= cos_thresh)

    # seed = nearest valid point to seed_point
    d_seed = jnp.where(frame.mask, jnp.sum((frame.points - seed_point) ** 2, axis=-1), jnp.inf)
    seed = jnp.argmin(d_seed)
    labels0 = jnp.zeros((frame.capacity,), dtype=bool).at[seed].set(True)

    def propagate(labels, adjacency):
        # a point joins if any admissible neighbor is labeled
        nb_lab = labels[idx] & adjacency
        return labels | (jnp.any(nb_lab, axis=-1) & frame.mask)

    def cond(state):
        labels, prev_count, steps = state
        return (steps < p.max_steps) & (jnp.sum(labels) > prev_count)

    def body(state):
        labels, _, steps = state
        prev = jnp.sum(labels)
        return (propagate(labels, edge_ok), prev, steps + 1)

    labels, _, _ = jax.lax.while_loop(cond, body, (propagate(labels0, edge_ok), jnp.int32(0), jnp.int32(0)))

    # dilation: distance-only expansion (reference's dilation pass)
    for _ in range(p.dilation_steps):
        labels = propagate(labels, nn_valid)
    return labels
