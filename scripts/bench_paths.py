"""Diagnose per-path on-device cost of the VGICP linearize hot-path candidates.

Times, on the real TPU (marginal protocol, fori_loop chains):
  A) moments-fused Pallas kernel (vgicp_scan_linearize)
  B) planar pipeline: probe + gather + finalize (XLA) -> sym_inv -> linearize_fused (Pallas)
  C) pure-XLA planar pipeline (probe + gather + finalize + linearize_point_system)
  D) linearize_fused alone on a frozen payload
Prints one JSON line with all timings.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import gtsam_points_tpu  # noqa: F401  (pins f32 matmul precision)
from gtsam_points_tpu.ops import planar
from gtsam_points_tpu.ops.pallas_linearize import linearize_fused, vgicp_scan_linearize
from gtsam_points_tpu.ops.voxelmap import build_voxelmap, lookup_fetch_planar
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io, se3


from gtsam_points_tpu.utils.benchtime import chain_marginal, tunnel_probe_ms as tunnel_probe


def main():
    cap = 25088
    pts0 = io.read_points("/root/reference/data/kitti_07_dump/000000/points.bin")
    pts1 = io.read_points("/root/reference/data/kitti_07_dump/000001/points.bin")
    target = make_frame(pts0, capacity=cap)
    source = make_frame(pts1, capacity=cap)
    vmap = jax.jit(lambda f: build_voxelmap(f, 0.5))(target)
    pts_p = source.points.T
    mask = source.mask

    def lin_planar_fused(T):
        """probe+gather+finalize in XLA, reduce via linearize_fused Pallas."""
        pm = planar.transform(T, pts_p)
        found, cnt, mu, C6 = lookup_fetch_planar(vmap, pm, mask)
        ok = found & (cnt >= 3.0)
        eye6 = jnp.asarray([1e-3, 0.0, 0.0, 1e-3, 0.0, 1e-3], jnp.float32)
        W6 = planar.sym_inv(C6 + eye6[:, None])
        return linearize_fused(pts_p, mu, W6, ok, T)

    def lin_planar_xla(T):
        pm = planar.transform(T, pts_p)
        found, cnt, mu, C6 = lookup_fetch_planar(vmap, pm, mask)
        ok = found & (cnt >= 3.0)
        eye6 = jnp.asarray([1e-3, 0.0, 0.0, 1e-3, 0.0, 1e-3], jnp.float32)
        W6 = planar.sym_inv(C6 + eye6[:, None])
        return planar.linearize_point_system(pts_p, pm, pm - mu, W6, ok, T[:3, :3])

    def lin_moments(T):
        return vgicp_scan_linearize(vmap, pts_p, mask, T, 3.0)

    # frozen payload for D
    T_id = jnp.eye(4)
    pm0 = planar.transform(T_id, pts_p)
    found0, cnt0, mu0, C60 = lookup_fetch_planar(vmap, pm0, mask)
    ok0 = found0 & (cnt0 >= 3.0)
    eye6 = jnp.asarray([1e-3, 0.0, 0.0, 1e-3, 0.0, 1e-3], jnp.float32)
    W60 = planar.sym_inv(C60 + eye6[:, None])
    mu0, W60, ok0 = jax.block_until_ready((mu0, W60, ok0))

    def lin_frozen(T):
        return linearize_fused(pts_p, mu0, W60, ok0, T)

    def make_loop(fn, lreps):
        @jax.jit
        def loop(T):
            def body(i, carry):
                T, acc = carry
                lin = fn(T)
                T = T.at[:3, 3].add(1e-9 * lin.b_s[:3])
                return (T, acc + lin.error)

            return jax.lax.fori_loop(0, lreps, body, (T, jnp.float32(0.0)))

        return loop

    def marginal_ms(fn, L1=10, L2=60):
        loops = {L: make_loop(fn, L) for L in (L1, L2)}
        for f in loops.values():
            jax.block_until_ready(f(T_id))
        marg_s, _ = chain_marginal(lambda L: jax.block_until_ready(loops[L](T_id)), L1, L2)
        return marg_s * 1000.0

    out = {"tunnel_dispatch_ms": round(tunnel_probe(), 4)}
    for name, fn in [
        ("planar_fused", lin_planar_fused),
        ("planar_xla", lin_planar_xla),
        ("frozen_fused", lin_frozen),
        ("moments_fused", lin_moments),
    ]:
        try:
            out[name + "_ms"] = round(marginal_ms(fn), 4)
        except Exception as e:  # noqa: BLE001
            out[name + "_err"] = repr(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
