"""Multi-device scaling: shard the per-point axis of factor linearization over
a jax.sharding.Mesh; the H/b block reduction crosses devices as one psum.

The reference is single-process/single-GPU (SURVEY.md §2.5, §5.8) — this layer
is the new distributed dimension. Design: the `LinearizedSystem6` reduction the
reference performs with cub::DeviceReduce on one GPU
(src/gtsam_points/cuda/integrated_vgicp_derivatives_linearize.cu:24-57) is an
associative monoid, so it shards trivially: each device linearizes its slice of
the source-point axis against a replicated (or halo-exchanged) map, and XLA
inserts the cross-device psum when the [12,12] block system is materialized.

Axes:
  "point" — data-parallel over points of each scan (dominant axis, N ~ 100k)
Keyframe/factor-axis sharding composes on top by stacking factors and vmapping
(see parallel/distributed.py in later rounds).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsam_points_tpu.types.frame import Frame


def make_mesh(n_devices: Optional[int] = None, axis: str = "point") -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_frame(frame: Frame, mesh: Mesh, axis: str = "point") -> Frame:
    """Place every per-point leaf of a Frame sharded along the mesh axis.
    Capacity must be divisible by the axis size."""
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, frame)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (maps, tables, poses) across the mesh."""
    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(*([None] * x.ndim))))

    return jax.tree_util.tree_map(put, tree)
