"""Distributed mapping on a device mesh: sharded voxel map ownership.

Demonstrates the map-sharded layer (parallel/sharded_voxelmap.py — the
capability the single-GPU reference does not have): voxel cells are
partitioned across the mesh by hashed-key ownership, so map capacity scales
with the number of devices; registration linearizes owner-computes with one
~0.5 KB psum per iteration, and map insertion is collective-free.

Runs on the 8-virtual-device CPU mesh by default (set
XLA_FLAGS=--xla_force_host_platform_device_count=8), identically on a real
TPU slice.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/distributed_mapping.py --platform cpu
"""

import os

import numpy as np

from _common import DATA, setup


def main():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    setup(__doc__)
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gtsam_points_tpu.factors import PriorFactor
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.parallel import (
        build_sharded_voxelmap,
        collective_bytes_per_linearize,
        make_vgicp_sharded_factor,
        place_sharded,
        sharded_insert_frame,
        sharded_num_voxels,
        sharded_overlap,
    )
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io, se3

    devs = jax.devices()
    D = len(devs)
    mesh = Mesh(np.asarray(devs), ("shard",))
    print(f"mesh: {D} x {devs[0].platform}")

    pts0 = io.read_points(os.path.join(DATA, "kitti_07_dump/000000/points.bin"))
    pts1 = io.read_points(os.path.join(DATA, "kitti_07_dump/000001/points.bin"))
    target = jax.jit(lambda f: voxelgrid_sampling(f, 0.5, capacity=16384))(
        make_frame(pts0, capacity=25088)
    )
    source = jax.jit(lambda f: voxelgrid_sampling(f, 0.5, capacity=16384))(
        make_frame(pts1, capacity=25088)
    )

    # build the sharded map: each device owns ~1/D of the cells
    svmap = place_sharded(
        build_sharded_voxelmap(target, 1.0, num_shards=D, capacity_per_shard=target.capacity // 2),
        mesh,
    )
    print(
        f"sharded map: {int(sharded_num_voxels(svmap))} voxels across {D} shards "
        f"(capacity {D} x {target.capacity // 2} — scales with the mesh)"
    )

    # register the next scan against the distributed map
    gt = io.load_graph(os.path.join(DATA, "kitti_07_dump/graph.txt"))
    T_gt = np.asarray(se3.pose_from_xyzq(jnp.asarray(gt)))
    delta_gt = np.linalg.inv(T_gt[0]) @ T_gt[1]
    init = jnp.asarray(delta_gt) @ se3.se3_exp(jnp.asarray([0.05, -0.03, 0.05, 0.3, -0.2, 0.1]))

    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(make_vgicp_sharded_factor(0, 1, svmap, source, mesh, min_voxel_points=4.0))
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=20)))(
        jnp.stack([jnp.eye(4), init])
    )
    rot_e, trans_e = se3.pose_error(jnp.asarray(delta_gt.astype(np.float32)), res.poses[1])
    print(
        f"registration vs GT: rot {float(rot_e):.5f} rad, trans {float(trans_e):.4f} m "
        f"({collective_bytes_per_linearize()} B over the interconnect per LM iteration)"
    )

    # insert the registered scan — owner-computes, zero collective traffic
    from gtsam_points_tpu.types.frame import transform_frame

    moved = transform_frame(res.poses[1], source)
    svmap, _overflow = jax.jit(sharded_insert_frame)(svmap, moved)
    print(
        f"after insert: {int(sharded_num_voxels(svmap))} voxels; "
        f"overlap of scan 1 with map: {float(sharded_overlap(svmap, source, res.poses[1])):.3f}"
    )


if __name__ == "__main__":
    main()
