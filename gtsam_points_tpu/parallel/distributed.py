"""Distributed graph optimization: shard batched factors across the mesh.

The strategy (SURVEY.md §5.8, new relative to the single-GPU reference):
- Keyframe/factor axis: each device owns F/D factors of a VGICPFactorBatch
  (stacked voxelmaps + source clouds sharded on their leading axis).
- The dense block system (A [6P,6P], b) is small (poses only) and replicated;
  XLA inserts the cross-device psum when sharded factor blocks scatter into it.
- Pose updates (solve + retract) are replicated work on every device — the
  classic "compute is sharded, state is replicated" pose-graph layout, so only
  6x6-per-pose information crosses the interconnect per iteration.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsam_points_tpu.factors.batch import VGICPFactorBatch
from gtsam_points_tpu.optim.graph import FactorGraph
from gtsam_points_tpu.optim.lm import LMParams, LMResult, optimize_lm


def shard_factor_batch(batch: VGICPFactorBatch, mesh: Mesh, axis: str = "factor") -> VGICPFactorBatch:
    """Place every stacked leaf sharded along the factor axis. The factor count
    must be divisible by the mesh axis size."""

    def put(x):
        if x is None:
            return None
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)


def optimize_lm_sharded(
    graph: FactorGraph,
    poses: jax.Array,
    mesh: Mesh,
    params: Optional[LMParams] = None,
) -> LMResult:
    """LM with replicated pose state; factor work shards wherever the graph's
    factor pytrees were placed (see shard_factor_batch)."""
    rep = NamedSharding(mesh, P())
    poses = jax.device_put(poses, rep)
    fn = jax.jit(lambda p: optimize_lm(graph, p, params), out_shardings=None)
    return fn(poses)
