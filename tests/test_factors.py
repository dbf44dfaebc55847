"""Factor linearization correctness: analytic(AD) b-vector vs numeric gradient
(reference pattern: util/jacobian_test.hpp finite-difference harness), plus
ground-truth recovery for every matching-cost factor family on a synthetic
structured scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import (
    BetweenFactor,
    PriorFactor,
    make_gicp_factor,
    make_icp_factor,
    make_vgicp_factor,
)
from gtsam_points_tpu.factors.colored import make_colored_gicp_factor
from gtsam_points_tpu.factors.ct_icp import deskew, make_ct_icp_factor
from gtsam_points_tpu.factors.loam import make_loam_factor
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.jacobian_test import check_factor_jacobian


def box_cloud(n=900, seed=0, noise=0.02):
    rng = np.random.RandomState(seed)
    pts = []
    for ax in range(3):
        p = rng.rand(n // 3, 3) * 10 - 5
        p[:, ax] = np.sign(p[:, ax]) * 5 + rng.randn(n // 3) * noise
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


XI_TRUE = jnp.array([0.04, -0.03, 0.05, 0.25, -0.15, 0.1])


@pytest.fixture(scope="module")
def scene():
    pts = box_cloud()
    target = make_frame(pts)
    target = estimate_normals_covs(target, k=8, grid_leaf=1.0)
    T_true = se3.se3_exp(XI_TRUE)
    src = np.asarray(se3.transform_points(se3.se3_inverse(T_true), jnp.asarray(pts)))
    source = make_frame(src)
    source = estimate_normals_covs(source, k=8, grid_leaf=1.0)
    return target, source, T_true


def run_graph(factor, T_true, tol_rot=2e-3, tol_trans=2e-2, max_iterations=15):
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(factor)
    poses = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=max_iterations)))(poses)
    rot_e, trans_e = se3.pose_error(T_true, res.poses[1])
    assert float(rot_e) < tol_rot, f"rot {float(rot_e)}"
    assert float(trans_e) < tol_trans, f"trans {float(trans_e)}"
    return res


def test_icp_converges(scene):
    target, source, T_true = scene
    run_graph(make_icp_factor(0, 1, target, source, max_corr_dist=2.0), T_true)


def test_point_to_plane_converges(scene):
    target, source, T_true = scene
    run_graph(make_icp_factor(0, 1, target, source, point_to_plane=True, max_corr_dist=2.0), T_true)


def test_gicp_converges(scene):
    target, source, T_true = scene
    run_graph(make_gicp_factor(0, 1, target, source, max_corr_dist=2.0), T_true)


def test_vgicp_converges(scene):
    target, source, T_true = scene
    # Synthetic box scene: voxel quantization limits accuracy (~0.03 rad);
    # the reference-bound check (0.015 rad) runs on real data in
    # tests/test_data_convergence.py.
    run_graph(
        make_vgicp_factor(0, 1, target, source, voxel_resolution=0.5, min_voxel_points=3),
        T_true,
        tol_rot=5e-2,
        tol_trans=1e-1,
    )


def test_loam_converges(scene):
    target, source, T_true = scene
    # use the box cloud for planes and a synthetic line set for edges
    rng = np.random.RandomState(3)
    t_line = rng.rand(300).astype(np.float32) * 8 - 4
    edges_t = np.stack([t_line, np.ones_like(t_line), np.ones_like(t_line)], axis=1)
    edges_t += rng.randn(300, 3).astype(np.float32) * 0.01
    edges_s = np.asarray(se3.transform_points(se3.se3_inverse(T_true), jnp.asarray(edges_t)))
    factor = make_loam_factor(
        0, 1,
        target_edges=make_frame(edges_t), target_planes=target,
        source_edges=make_frame(edges_s), source_planes=source,
        max_corr_dist=2.0,
    )
    run_graph(factor, T_true, tol_rot=5e-3, tol_trans=5e-2)


def test_gicp_jacobian(scene):
    target, source, T_true = scene
    factor = make_gicp_factor(0, 1, target, source, max_corr_dist=2.0)
    poses = np.stack([np.eye(4, dtype=np.float32), np.asarray(se3.se3_exp(0.5 * XI_TRUE))])
    check_factor_jacobian(factor, poses)


def test_icp_jacobian(scene):
    target, source, T_true = scene
    factor = make_icp_factor(0, 1, target, source, max_corr_dist=2.0)
    poses = np.stack([np.eye(4, dtype=np.float32), np.asarray(se3.se3_exp(0.5 * XI_TRUE))])
    check_factor_jacobian(factor, poses)


def test_between_prior_graph():
    """Pose-graph-only optimization: chain of between factors + prior."""
    key = jax.random.PRNGKey(0)
    T01 = se3.se3_exp(jnp.array([0.1, 0.0, 0.2, 1.0, 0.0, 0.0]))
    T12 = se3.se3_exp(jnp.array([0.0, 0.1, -0.1, 1.0, 0.5, 0.0]))
    graph = FactorGraph(num_poses=3)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(BetweenFactor(measured=T01, weights=jnp.ones(6) * 100, target_key=0, source_key=1))
    graph.add(BetweenFactor(measured=T12, weights=jnp.ones(6) * 100, target_key=1, source_key=2))
    noise = jax.random.normal(key, (3, 6)) * 0.1
    poses0 = jnp.stack([jnp.eye(4), T01, T01 @ T12]) @ se3.se3_exp(noise)
    res = jax.jit(lambda p: optimize_lm(graph, p))(poses0)
    rot_e, trans_e = se3.pose_error(res.poses[1], T01)
    assert float(rot_e) < 1e-4 and float(trans_e) < 1e-4
    rot_e, trans_e = se3.pose_error(res.poses[2], T01 @ T12)
    assert float(rot_e) < 1e-4 and float(trans_e) < 1e-4


def test_ct_icp_deskew_and_converge(scene):
    """CT-ICP: source is scanned while moving; recover begin/end poses."""
    target, _, _ = scene
    pts = np.asarray(target.points)[np.asarray(target.mask)]
    n = len(pts)
    rng = np.random.RandomState(5)
    times = np.sort(rng.rand(n).astype(np.float32))
    T0 = se3.se3_exp(jnp.zeros(6))
    xi_motion = jnp.array([0.02, -0.01, 0.03, 0.4, -0.2, 0.1])
    T1 = se3.se3_exp(xi_motion)
    # simulate: world point p observed at time t from pose T(t): local = T(t)^-1 p
    from gtsam_points_tpu.factors.ct_icp import interpolate_poses

    Ts = interpolate_poses(T0, T1, jnp.asarray(times))
    local = jnp.einsum("nji,nj->ni", Ts[:, :3, :3], jnp.asarray(pts) - Ts[:, :3, 3])
    source = make_frame(np.asarray(local), times=times)

    factor = make_ct_icp_factor(0, 1, target, source, max_corr_dist=2.0)
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e4), key=0))
    graph.add(factor)
    noise = jnp.asarray(rng.randn(6).astype(np.float32) * 0.05)
    poses0 = jnp.stack([jnp.eye(4), T1 @ se3.se3_exp(noise)])
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=15)))(poses0)
    rot_e, trans_e = se3.pose_error(T1, res.poses[1])
    assert float(rot_e) < 5e-3 and float(trans_e) < 5e-2
    # deskew returns motion-compensated points close to world points (T0 = I)
    desk = deskew(res.poses[0], res.poses[1], factor.source)
    err = jnp.linalg.norm(desk.points[:n] - jnp.asarray(pts), axis=-1)
    assert float(jnp.mean(err)) < 0.05


def test_colored_gicp_converges():
    """Photometric term disambiguates translation along a plane."""
    rng = np.random.RandomState(7)
    n = 1200
    # flat plane z=0 with intensity pattern -> geometric cost alone is degenerate in x,y
    xy = rng.rand(n, 2).astype(np.float32) * 10 - 5
    pts = np.concatenate([xy, np.zeros((n, 1), np.float32)], axis=1)
    intens = np.sin(xy[:, 0] * 2.0) + np.cos(xy[:, 1] * 1.5)
    target = make_frame(pts, intensities=intens)
    target = estimate_normals_covs(target, k=8, grid_leaf=1.0)
    T_true = se3.se3_exp(jnp.array([0.0, 0.0, 0.02, 0.15, -0.1, 0.0]))
    src = np.asarray(se3.transform_points(se3.se3_inverse(T_true), jnp.asarray(pts)))
    # source intensity = same world pattern
    source = make_frame(src, intensities=intens)
    source = estimate_normals_covs(source, k=8, grid_leaf=1.0)
    factor = make_colored_gicp_factor(0, 1, target, source, max_corr_dist=2.0, photometric_weight=50.0)
    run_graph(factor, T_true, tol_rot=5e-3, tol_trans=3e-2)


def test_correspondence_update_tolerance(scene):
    """Movement-gated correspondence caching (reference:
    set_correspondence_update_tolerance) converges to the same solution as
    fresh-search LM for GICP, VGICP, and ICP."""
    target, source, T_true = scene
    lm_cached = LMParams(
        max_iterations=20,
        correspondence_update_tolerance_rot=0.02,
        correspondence_update_tolerance_trans=0.05,
    )
    for make in (
        lambda: make_gicp_factor(0, 1, target, source, max_corr_dist=2.0),
        lambda: make_vgicp_factor(0, 1, target, source, voxel_resolution=0.5, min_voxel_points=3),
        lambda: make_icp_factor(0, 1, target, source, max_corr_dist=2.0),
    ):
        graph = FactorGraph(num_poses=2)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
        graph.add(make())
        poses = jnp.stack([jnp.eye(4), jnp.eye(4)])
        res_fresh = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=20)))(poses)
        res_cached = jax.jit(lambda p: optimize_lm(graph, p, lm_cached))(poses)
        rot_f, trans_f = se3.pose_error(T_true, res_fresh.poses[1])
        rot_c, trans_c = se3.pose_error(T_true, res_cached.poses[1])
        # cached path must match the fresh path's accuracy class
        assert float(rot_c) < max(2.0 * float(rot_f), 5e-2), (float(rot_c), float(rot_f))
        assert float(trans_c) < max(2.0 * float(trans_f), 1e-1), (float(trans_c), float(trans_f))


def test_intensity_gradients_ivox_linear_field():
    """Voxel-map-resident intensity gradients (the reference's experimental
    IntensityGradientsiVox, intensity_gradients_ivox_.hpp:11-56): on a plane
    z=0 carrying a linear intensity field I = a.x, the per-voxel gradients
    must recover `a` (projected on the plane), and the per-point lookup
    returns its voxel's gradient."""
    from gtsam_points_tpu.factors.colored import (
        estimate_intensity_gradients_ivox,
        lookup_intensity_gradients_ivox,
    )
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.types.frame import make_frame

    rng = np.random.RandomState(4)
    pts = np.zeros((3000, 3), np.float32)
    pts[:, :2] = rng.rand(3000, 2).astype(np.float32) * 10.0
    a = np.asarray([0.3, -0.2, 0.0], np.float32)
    inten = pts @ a
    frame = make_frame(pts, intensities=inten, capacity=4096)
    vmap = jax.jit(lambda f: build_voxelmap(f, 1.0))(frame)
    grads = jax.jit(estimate_intensity_gradients_ivox)(vmap)

    valid = np.asarray(vmap.keys != -1) & (np.asarray(vmap.moments[:, 0]) > 0)
    # interior voxels (away from the field border where the LSQ is one-sided)
    mu = np.asarray(jax.jit(lambda v: v.mean)(vmap))
    interior = valid & (mu[:, 0] > 1.5) & (mu[:, 0] < 8.5) & (mu[:, 1] > 1.5) & (mu[:, 1] < 8.5)
    assert interior.sum() > 20
    g = np.asarray(grads)[interior]
    err = np.linalg.norm(g - a[None, :], axis=1)
    assert np.median(err) < 0.05, f"median gradient err {np.median(err)}"

    # per-point lookup returns the owning voxel's gradient
    pg, found = jax.jit(
        lambda v, g, f: lookup_intensity_gradients_ivox(v, g, f.points, f.mask)
    )(vmap, grads, frame)
    assert bool(np.asarray(found)[np.asarray(frame.mask)].all())
    some = np.asarray(pg)[np.asarray(frame.mask)]
    assert np.isfinite(some).all()
