"""Source-cluster registration + cluster-moment insertion (round 5).

Covers the three cluster-path invariants:
- cluster_source conserves mass and first moments exactly,
- insert_clusters_incremental equals the per-point insert when clusters
  fall wholly inside voxels (the SE3 parallel-axis transform is exact),
- register_clusters_pyramid converges on a synthetic pair within the
  reference accuracy bounds from perturbed inits.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.ops.voxelmap import build_voxelmap, empty_voxelmap, insert_frame
from gtsam_points_tpu.registration import (
    DEFAULT_CLUSTER_STAGES,
    build_pyramid,
    cluster_source,
    insert_clusters_incremental,
    register_clusters_pyramid,
)
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3

ROT_TOL = 0.015
TRANS_TOL = 0.15


def _blob_cloud(rng, n_blobs=60, pts_per=40, leaf=1.0):
    """Blobs tight around distinct voxel centers: every cluster lands wholly
    inside one voxel, making the cluster insert exactly equal the point
    insert."""
    centers = (rng.randint(-8, 8, (n_blobs, 3)) + 0.5) * leaf
    centers = np.unique(centers, axis=0)
    pts = (
        centers[:, None, :] + rng.randn(centers.shape[0], pts_per, 3) * (0.05 * leaf)
    ).reshape(-1, 3)
    return pts.astype(np.float32)


def test_cluster_source_conserves_moments():
    rng = np.random.RandomState(0)
    pts = (rng.rand(3000, 3) * 20).astype(np.float32)
    f = make_frame(pts)
    cl = jax.jit(lambda s: cluster_source(s, 1.0, 4096))(f)
    n_valid = int(jnp.sum(f.mask))
    assert float(jnp.sum(cl.weight)) == n_valid
    # weighted centroid of clusters == centroid of points
    c_cl = np.asarray(jnp.sum(cl.pts_p * cl.weight[None, :], axis=1) / jnp.sum(cl.weight))
    c_pt = pts.mean(axis=0)
    np.testing.assert_allclose(c_cl, c_pt, atol=1e-3)


def test_insert_clusters_transform_identity_totals():
    """Full SE3 (rotation + translation): the map-wide TOTAL moments of the
    cluster insert equal the point insert exactly — the parallel-axis
    identity S2' = n(R C R^T + mu_w mu_w^T) is what this exercises; totals
    are voxel-assignment-independent, so border-straddling clusters don't
    confound it."""
    rng = np.random.RandomState(1)
    leaf = 1.0
    pts = _blob_cloud(rng, leaf=leaf)
    f = make_frame(pts)
    xi = jnp.asarray([0.05, -0.03, 0.08, 0.6, -0.4, 0.3], jnp.float32)
    T = se3.se3_exp(xi)

    cl = jax.jit(lambda s: cluster_source(s, leaf, 2048))(f)
    vm0 = empty_voxelmap(leaf, 8192)
    vm_cl, ov = jax.jit(insert_clusters_incremental)(vm0, cl, T)
    assert not bool(ov)

    from gtsam_points_tpu.types.frame import transform_frame

    wf = jax.jit(transform_frame)(T, f)
    vm_pt = jax.jit(insert_frame)(empty_voxelmap(leaf, 8192), wf)

    tot_cl = np.asarray(jnp.sum(vm_cl.moments[:, :10], axis=0))
    tot_pt = np.asarray(jnp.sum(vm_pt.moments[:, :10], axis=0))
    np.testing.assert_allclose(tot_cl, tot_pt, rtol=3e-4, atol=1e-2)


def test_insert_clusters_matches_point_insert_on_blobs():
    """Pure integer-leaf translation keeps every blob wholly inside one
    voxel, so the cluster insert must equal the per-point structural insert
    voxel by voxel."""
    rng = np.random.RandomState(1)
    leaf = 1.0
    pts = _blob_cloud(rng, leaf=leaf)
    f = make_frame(pts)
    T = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.asarray([2.0, -3.0, 1.0]))

    cl = jax.jit(lambda s: cluster_source(s, leaf, 2048))(f)
    vm0 = empty_voxelmap(leaf, 8192)
    vm_cl, ov = jax.jit(insert_clusters_incremental)(vm0, cl, T)
    assert not bool(ov)

    from gtsam_points_tpu.types.frame import transform_frame

    wf = jax.jit(transform_frame)(T, f)
    vm_pt = jax.jit(insert_frame)(empty_voxelmap(leaf, 8192), wf)

    k_cl = np.asarray(vm_cl.keys)
    k_pt = np.asarray(vm_pt.keys)
    assert set(k_cl[k_cl != np.int32(0x7FFFFFFF)]) == set(k_pt[k_pt != np.int32(0x7FFFFFFF)])
    m_cl = {int(k): np.asarray(vm_cl.moments[i, :10]) for i, k in enumerate(k_cl) if k != 0x7FFFFFFF}
    for i, k in enumerate(k_pt):
        if k == 0x7FFFFFFF:
            continue
        np.testing.assert_allclose(
            m_cl[int(k)], np.asarray(vm_pt.moments[i, :10]), rtol=2e-4, atol=2e-3
        )


def test_register_clusters_pyramid_converges_synthetic():
    from gtsam_points_tpu.utils.synthetic import ring_scans, ring_trajectory, ring_world

    world = ring_world(0, 24000)
    T_true = ring_trajectory(4, 100)  # 3.6-degree steps (~1.4 m)
    scans = ring_scans(world, T_true, 4096, noise=0.003, seed=2)
    target = make_frame(scans[0], capacity=4096)
    source = make_frame(scans[1], capacity=4096)
    T_rel = jnp.asarray(np.linalg.inv(T_true[0]) @ T_true[1])

    maps = jax.jit(lambda f: build_pyramid(f, DEFAULT_CLUSTER_STAGES))(target)
    cl = jax.jit(lambda s: cluster_source(s, 0.5, 4096))(source)
    reg = jax.jit(
        jax.vmap(lambda T0: register_clusters_pyramid(maps, cl, T0, DEFAULT_CLUSTER_STAGES,
                                                      min_voxel_points=1.0))
    )
    rng = np.random.RandomState(3)
    xis = jnp.asarray(rng.uniform(-0.1, 0.1, (8, 6)).astype(np.float32))
    T0s = jax.vmap(lambda xi: T_rel @ se3.se3_exp(xi))(xis)
    Ts = reg(T0s)
    rot_e, trans_e = jax.vmap(lambda T: se3.pose_error(T, T_rel))(Ts)
    assert float(jnp.max(rot_e)) < ROT_TOL, float(jnp.max(rot_e))
    assert float(jnp.max(trans_e)) < TRANS_TOL, float(jnp.max(trans_e))


def test_vgicp_clusters_factor_lm_converges_kitti(data_root):
    """Single-stream LM with the cluster-source VGICP factor (the latency
    path) lands within the reference bounds on the kitti_07 pair, matching
    the point-factor protocol of bench_suite config 1."""
    import os

    from gtsam_points_tpu.factors import make_vgicp_clusters_factor
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.registration import cluster_source
    from gtsam_points_tpu.utils import io

    cap = 25088
    pts0 = io.read_points(os.path.join(data_root, "kitti_07_dump/000000/points.bin"))
    pts1 = io.read_points(os.path.join(data_root, "kitti_07_dump/000001/points.bin"))
    g = io.load_graph(os.path.join(data_root, "kitti_07_dump/graph.txt"))
    T_rel = se3.se3_inverse(se3.pose_from_xyzq(jnp.asarray(g[0]))) @ se3.pose_from_xyzq(
        jnp.asarray(g[1])
    )
    prep = jax.jit(lambda f: estimate_normals_covs(f, k=10, grid_leaf=1.0))
    target = prep(make_frame(pts0, capacity=cap))
    source = prep(make_frame(pts1, capacity=cap))
    clusters = jax.jit(lambda s: cluster_source(s, 1.0, 5632))(source)

    graph = FactorGraph(num_poses=1)
    graph.add(make_vgicp_clusters_factor(-1, 0, build_voxelmap(target, 1.0),
                                         clusters, min_voxel_points=4))
    T0 = (T_rel @ se3.se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.06, -0.08, 0.05])))[None]
    res = jax.jit(
        lambda p: optimize_lm(graph, p, LMParams(max_iterations=10, max_inner_iterations=5))
    )(T0)
    rot_e, trans_e = se3.pose_error(res.poses[0], T_rel)
    assert float(rot_e) < ROT_TOL, float(rot_e)
    assert float(trans_e) < TRANS_TOL, float(trans_e)
