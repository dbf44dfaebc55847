import json, os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import gtsam_points_tpu  # noqa
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.ops.voxelmap import build_voxelmap
from gtsam_points_tpu.ops.pallas_linearize import vgicp_scan_linearize
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io, se3
from gtsam_points_tpu.registration import build_pyramid, register_scan_pyramid
from gtsam_points_tpu.registration.pyramid import DEFAULT_STAGES

cap = 25088
data = io.data_root()
pts0 = io.read_points(os.path.join(data, "kitti_07_dump/000000/points.bin"))
pts1 = io.read_points(os.path.join(data, "kitti_07_dump/000001/points.bin"))
g = io.load_graph(os.path.join(data, "kitti_07_dump/graph.txt"))
T_rel = se3.se3_inverse(se3.pose_from_xyzq(jnp.asarray(g[0]))) @ se3.pose_from_xyzq(jnp.asarray(g[1]))

prep = jax.jit(lambda f: estimate_normals_covs(f, k=10, grid_leaf=1.0))
target = prep(make_frame(pts0, capacity=cap))
source = prep(make_frame(pts1, capacity=cap))

B = 64
maps = jax.jit(lambda f: build_pyramid(f))(target)
rng = np.random.RandomState(0)
xis = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)).astype(np.float32))
T0s = jax.vmap(lambda xi: T_rel @ se3.se3_exp(xi))(xis)

pts_p = source.points.T
c = source.covs
covs6 = jnp.stack([c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]])
mask = source.mask


def timeit(fn, arg, reps=8):
    out = fn(arg); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0


# 1) full batched register (current headline program)
full = jax.jit(jax.vmap(lambda T0: register_scan_pyramid(maps, source, T0)))
print("full_register_ms", timeit(full, T0s))

# 2) register with solve replaced by trivial update (isolates cho_solve cost)
def register_nosolve(T0):
    T = T0
    for vm, (_, iters) in zip(maps, DEFAULT_STAGES):
        def body(i, T, vm=vm):
            lin = vgicp_scan_linearize(vm, pts_p, mask, T, 1.0, src_covs6=covs6)
            return T @ se3.se3_exp(1e-9 * lin.b_s)
        T = jax.lax.fori_loop(0, iters, body, T)
    return T

nosolve = jax.jit(jax.vmap(register_nosolve))
print("nosolve_register_ms", timeit(nosolve, T0s))

# 3) linearize-only, fine map, 7 iters (lower bound of the current schedule)
def lin7(T0):
    def body(i, carry):
        T, acc = carry
        lin = vgicp_scan_linearize(maps[-1], pts_p, mask, T, 1.0, src_covs6=covs6)
        return (T @ se3.se3_exp(1e-9 * lin.b_s), acc + lin.error)
    return jax.lax.fori_loop(0, 7, body, (T0, jnp.float32(0.0)))[1]

lin7j = jax.jit(jax.vmap(lin7))
print("lin7_only_ms", timeit(lin7j, T0s))

# 4) single-lane lin7 x timing (to see vmap scaling)
lin7s = jax.jit(lin7)
print("lin7_single_ms", timeit(lin7s, T0s[0]))
