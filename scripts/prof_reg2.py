"""Round-4 profiling: component costs of the batched registration at B=64."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import gtsam_points_tpu  # noqa
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.ops.voxelmap import build_voxelmap, table_probe
from gtsam_points_tpu.ops.pallas_linearize import (
    vgicp_scan_linearize, linearize_vgicp_moments)
from gtsam_points_tpu.ops import planar, voxel_keys as vk
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import io, se3

cap = 25088
data = io.data_root()
pts0 = io.read_points(os.path.join(data, "kitti_07_dump/000000/points.bin"))
pts1 = io.read_points(os.path.join(data, "kitti_07_dump/000001/points.bin"))
g = io.load_graph(os.path.join(data, "kitti_07_dump/graph.txt"))
T_rel = se3.se3_inverse(se3.pose_from_xyzq(jnp.asarray(g[0]))) @ se3.pose_from_xyzq(jnp.asarray(g[1]))

prep = jax.jit(lambda f: estimate_normals_covs(f, k=10, grid_leaf=1.0))
target = prep(make_frame(pts0, capacity=cap))
source = prep(make_frame(pts1, capacity=cap))
vmapM = jax.jit(lambda f: build_voxelmap(f, 1.0))(target)

B = 64
rng = np.random.RandomState(0)
xis = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)).astype(np.float32))
T0s = jax.vmap(lambda xi: T_rel @ se3.se3_exp(xi))(xis)

pts_p = source.points.T
c = source.covs
covs6 = jnp.stack([c[:, 0, 0], c[:, 0, 1], c[:, 0, 2], c[:, 1, 1], c[:, 1, 2], c[:, 2, 2]])
mask = source.mask


def timeit(fn, arg, reps=6):
    out = fn(arg); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0


# a) probe+gather only, batched (1 iteration)
def probe_only(T):
    pm = planar.transform(T, pts_p)
    keys = vk.point_keys_planar(pm, mask, vmapM.leaf)
    _, found, pick, _ = table_probe(vmapM.table, keys)
    return pick.T[2:12].sum() + found.sum()

probe_b = jax.jit(jax.vmap(probe_only))
print("probe_gather_batched_ms_per_iter", timeit(probe_b, T0s))

# b) cached-moments kernel only, batched (momT fixed, 1 iteration)
def momT_of(T):
    pm = planar.transform(T, pts_p)
    keys = vk.point_keys_planar(pm, mask, vmapM.leaf)
    _, found, pick, _ = table_probe(vmapM.table, keys)
    return pick.T[2:12], found & mask

momTs, founds = jax.jit(jax.vmap(momT_of))(T0s)

def cached_lin(args):
    T, momT, found = args
    lin = linearize_vgicp_moments(pts_p, momT, found, T, 1.0, src_covs6=covs6)
    return lin.H_ss.sum() + lin.b_s.sum() + lin.error

cached_b = jax.jit(jax.vmap(cached_lin))
print("cached_kernel_batched_ms_per_iter", timeit(cached_b, (T0s, momTs, founds)))

# c) full scan linearize batched (1 iteration) = a+b fused-ish
full1 = jax.jit(jax.vmap(lambda T: vgicp_scan_linearize(vmapM, pts_p, mask, T, 1.0, src_covs6=covs6).error))
print("full_linearize_batched_ms_per_iter", timeit(full1, T0s))

# d) slim probe: gather keys-only table then 16-lane record  — simulate cost
#    with a [N] int32 gather + [N,16] gather from reshaped table
flat = vmapM.table.reshape(-1, 16)
keys_tab = jax.lax.bitcast_convert_type(flat[:, 0], jnp.int32)  # [slots]
def slim(T):
    pm = planar.transform(T, pts_p)
    keys = vk.point_keys_planar(pm, mask, vmapM.leaf)
    m = vmapM.table.shape[0]
    from gtsam_points_tpu.ops.voxelmap import _hash_key
    h = _hash_key(keys, 0, m)
    base = h * 8
    k8 = keys_tab[base[:, None] + jnp.arange(8)]  # [N, 8] gather (32 B/row)
    sel = k8 == keys[:, None]
    found = jnp.any(sel, axis=-1)
    slot = base + jnp.argmax(sel, axis=-1)
    rec = flat[slot]  # [N,16] gather (64 B/row)
    return rec.T[2:12].sum() + found.sum()

slim_b = jax.jit(jax.vmap(slim))
print("slim_probe_batched_ms_per_iter", timeit(slim_b, T0s))
