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


def make_mesh_2d(
    n_hosts: Optional[int] = None,
    chips_per_host: Optional[int] = None,
    axes=("host", "chip"),
) -> Mesh:
    """Two-level mesh for multi-host deployments: the leading axis maps onto
    DCN (across hosts), the trailing axis onto ICI (chips within a host).
    Collectives over the "chip" axis ride ICI; only reductions over "host"
    touch DCN, so layouts should psum over "chip" first (or over both axes
    at once and let XLA build the hierarchical reduction). On a single host
    this still shapes the program exactly as the pod would run it — the
    basis of the virtual multi-host tests.

    `jax.devices()` does NOT guarantee process-contiguous ordering (on TPU
    v4+ device ids follow physical topology coordinates, so one host's
    chips are generally non-contiguous in the flat list). The mesh is
    therefore built from devices sorted by (process_index, id) — each mesh
    row then really is one host's chips, keeping the "chip" axis on ICI.
    Where available, jax.experimental.mesh_utils.create_hybrid_device_mesh
    is used instead: it additionally orders chips within a host along the
    physical ICI torus."""
    # sort the FULL device list before slicing: slicing an interleaved
    # jax.devices() first could put chips of different hosts in one mesh row
    # even after sorting the slice (review finding, round 3)
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_hosts is None:
        n_hosts = max(len({d.process_index for d in devs}), 1)
    if chips_per_host is None:
        chips_per_host = len(devs) // n_hosts
    n = n_hosts * chips_per_host
    if n_hosts > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (chips_per_host,), (n_hosts,), devices=devs[:n]
            ).reshape(n_hosts, chips_per_host)
            return Mesh(arr, axes)
        except Exception:  # noqa: BLE001 — topology query unsupported (e.g. CPU mesh)
            pass
    return Mesh(np.asarray(devs[:n]).reshape(n_hosts, chips_per_host), axes)


def global_put(x, sharding):
    """device_put that also works in MULTI-PROCESS runs. jax.device_put
    cross-checks host values across processes with an equality assert that
    treats NaN != NaN — and voxel probe tables legitimately contain NaN
    (int32 keys bitcast to f32). jax.make_array_from_callback builds the
    global array from per-process local shards without that check."""
    if jax.process_count() > 1:
        xnp = np.asarray(x)
        return jax.make_array_from_callback(xnp.shape, sharding, lambda idx: xnp[idx])
    return jax.device_put(x, sharding)


def shard_frame(frame: Frame, mesh: Mesh, axis: str = "point") -> Frame:
    """Place every per-point leaf of a Frame sharded along the mesh axis.
    Capacity must be divisible by the axis size."""
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        if x is None:
            return None
        return global_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, frame)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (maps, tables, poses) across the mesh."""
    def put(x):
        if x is None:
            return None
        return global_put(x, NamedSharding(mesh, P(*([None] * x.ndim))))

    return jax.tree_util.tree_map(put, tree)
