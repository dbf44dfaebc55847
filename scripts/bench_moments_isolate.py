"""Isolate the 33ms: time (a) the XLA prefix of vgicp_scan_linearize
(probe + [10,N] gather) alone, (b) the moments Pallas kernel alone on frozen
inputs, (c) kernel variants (16-lane stream, no-SMEM-scalars)."""

import functools
import json
import time

import jax
import jax.numpy as jnp

import gtsam_points_tpu  # noqa: F401
from gtsam_points_tpu.ops import planar
from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.ops.voxelmap import lookup_rows
from gtsam_points_tpu.ops.pallas_linearize import linearize_vgicp_moments
from gtsam_points_tpu.ops.voxelmap import build_voxelmap
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io


from gtsam_points_tpu.utils.benchtime import chain_marginal


def marginal_ms(make_loop, L1=10, L2=60):
    loops = {L: make_loop(L) for L in (L1, L2)}
    for f in loops.values():
        jax.block_until_ready(f())
    marg_s, _ = chain_marginal(lambda L: jax.block_until_ready(loops[L]()), L1, L2)
    return marg_s * 1000.0


def main():
    cap = 25088
    pts0 = io.read_points("/root/reference/data/kitti_07_dump/000000/points.bin")
    pts1 = io.read_points("/root/reference/data/kitti_07_dump/000001/points.bin")
    target = make_frame(pts0, capacity=cap)
    source = make_frame(pts1, capacity=cap)
    vmap = jax.jit(lambda f: build_voxelmap(f, 0.5))(target)
    pts_p = source.points.T
    mask = source.mask
    T_id = jnp.eye(4)

    # frozen inputs for the kernel-alone test
    pm = planar.transform(T_id, pts_p)
    keys = vk.point_keys_planar(pm, mask, vmap.leaf)
    row, found = lookup_rows(vmap, keys)
    momT = vmap.moments[row, :10].T
    momT, found_m = jax.block_until_ready((momT, found & mask))

    out = {}

    # (a) XLA prefix alone
    def make_prefix_loop(L):
        @jax.jit
        def loop():
            def body(i, acc):
                pm = planar.transform(T_id, pts_p) + acc * 1e-30
                keys = vk.point_keys_planar(pm, mask, vmap.leaf)
                row, fnd = lookup_rows(vmap, keys)
                mT = vmap.moments[row, :10].T
                return acc + jnp.sum(mT[0]) + jnp.sum(fnd)

            return jax.lax.fori_loop(0, L, body, jnp.float32(0.0))

        return loop

    out["xla_prefix_ms"] = round(marginal_ms(make_prefix_loop), 4)

    # (b) moments kernel alone, frozen inputs
    def make_kernel_loop(L):
        @jax.jit
        def loop():
            def body(i, carry):
                T, acc = carry
                lin = linearize_vgicp_moments(pts_p, momT, found_m, T, 3.0)
                T = T.at[:3, 3].add(1e-9 * lin.b_s[:3])
                return (T, acc + lin.error)

            return jax.lax.fori_loop(0, L, body, (T_id, jnp.float32(0.0)))

        return loop

    out["kernel_frozen_ms"] = round(marginal_ms(make_kernel_loop), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
