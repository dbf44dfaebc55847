"""Global registration tests following the reference protocol
(src/test/test_global_registration.cpp): two real KITTI-00 scans, ground truth
from fine registration, then a large known perturbation (90-deg yaw + 20 m
translation) recovered by FPFH + RANSAC / GNC. Bounds: trans <= 0.5 m,
rot <= 0.1 rad; 4-DoF alignment keeps the z axis exact (<= 1e-6)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import PriorFactor, make_gicp_factor
from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
from gtsam_points_tpu.ops.features import estimate_normals_covs
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.lm import LMParams
from gtsam_points_tpu.registration import (
    GNCParams,
    RANSACParams,
    align_points_4dof,
    align_points_se3,
    estimate_fpfh,
    estimate_pose_gnc,
    estimate_pose_ransac,
)
from gtsam_points_tpu.types.frame import make_frame, transform_frame
from gtsam_points_tpu.utils import io, se3


@pytest.fixture(scope="module")
def kitti_pair(data_root):
    @jax.jit
    def preprocess(f):
        f = voxelgrid_sampling(f, 0.5, capacity=16384)
        return estimate_normals_covs(f, k=10, grid_leaf=1.0)

    frames = []
    for name in ("000000.bin", "000001.bin"):
        # these dumps are packed xyz triplets (the reference reads them with
        # read_points, src/test/test_global_registration.cpp:18-19)
        pts = io.read_points(os.path.join(data_root, "kitti_00", name))
        frames.append(preprocess(make_frame(pts, capacity=131072)))
    target, source = frames

    # fine-align source to target for ground truth (reference does the same
    # with an ICP factor before applying the test perturbation)
    graph = FactorGraph(num_poses=1)
    graph.add(
        make_gicp_factor(-1, 0, target, source, max_corr_dist=2.0, grid_leaf=1.0)
    )
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=15)))(
        jnp.eye(4)[None]
    )
    source = transform_frame(res.poses[0], source)

    # known large perturbation: ~90 deg near-z yaw + [20, 5, 1] translation
    axis = jnp.asarray([0.01, 0.0, 1.0])
    axis = axis / jnp.linalg.norm(axis)
    R = se3.so3_exp(axis * (jnp.pi / 2))
    T_true = se3.make_transform(R, jnp.asarray([20.0, 5.0, 1.0]))
    source = transform_frame(se3.se3_inverse(T_true), source)

    f_t = estimate_fpfh(target)
    f_s = estimate_fpfh(source)
    return target, source, f_t, f_s, T_true


def check_pose(T_est, T_true, rot_tol=0.1, trans_tol=0.5):
    rot_e, trans_e = se3.pose_error(jnp.asarray(T_true), jnp.asarray(T_est))
    assert float(rot_e) < rot_tol, f"rot {float(rot_e)}"
    assert float(trans_e) < trans_tol, f"trans {float(trans_e)}"


def test_align_points_se3_exact():
    rng = np.random.RandomState(1)
    src = rng.randn(10, 3).astype(np.float32)
    T = se3.se3_exp(jnp.array([0.3, -0.5, 0.7, 1.0, 2.0, -1.0]))
    tgt = np.asarray(se3.transform_points(T, jnp.asarray(src)))
    T_est = align_points_se3(jnp.asarray(src), jnp.asarray(tgt))
    check_pose(T_est, T, rot_tol=1e-4, trans_tol=1e-4)


def test_align_points_4dof_z_invariance():
    rng = np.random.RandomState(2)
    src = rng.randn(20, 3).astype(np.float32)
    tgt = rng.randn(20, 3).astype(np.float32)
    T = align_points_4dof(jnp.asarray(src), jnp.asarray(tgt))
    z = np.asarray(T[:3, :3]) @ np.array([0.0, 0.0, 1.0])
    assert abs(z[0]) < 1e-6 and abs(z[1]) < 1e-6 and abs(z[2] - 1) < 1e-6


def test_ransac_registration(kitti_pair):
    target, source, f_t, f_s, T_true = kitti_pair
    res = jax.jit(
        lambda: estimate_pose_ransac(target, source, f_t, f_s, RANSACParams(max_iterations=8192))
    )()
    check_pose(res.T_target_source, T_true)


def test_gnc_registration(kitti_pair):
    target, source, f_t, f_s, T_true = kitti_pair
    res = jax.jit(lambda: estimate_pose_gnc(target, source, f_t, f_s, GNCParams()))()
    check_pose(res.T_target_source, T_true)


def test_fpfh_properties(kitti_pair):
    target, _, f_t, _, _ = kitti_pair
    f = np.asarray(f_t)
    mask = np.asarray(target.mask)
    sums = f[mask].reshape(-1, 3, 11).sum(-1)
    # each sub-histogram sums to 100 (PCL percent convention); isolated points
    # with no neighbors legitimately have all-zero descriptors
    ok = np.isclose(sums, 100.0, atol=1e-2) | np.isclose(sums, 0.0, atol=1e-6)
    assert ok.all(), f"bad sums: {sums[~ok.all(-1)][:5]}"
    assert np.isclose(sums, 100.0, atol=1e-2).mean() > 0.99
    assert (f[~mask] == 0).all()


def test_pfh_dimensions_and_invariance():
    """PFH-125 (reference: features/fpfh_estimation.hpp estimate_pfh,
    PFH_DIM=125): percent-normalized joint histogram, invariant under rigid
    transforms of the cloud (pair features are relative)."""
    from gtsam_points_tpu.registration.fpfh import PFH_DIM, estimate_pfh
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.utils import se3

    rng = np.random.RandomState(11)
    pts = (rng.rand(400, 3) * 4.0).astype(np.float32)
    pts[:, 2] = 0.2 * np.sin(pts[:, 0]) + 0.1 * pts[:, 1]  # smooth surface
    frame = estimate_normals_covs(make_frame(pts), k=10, grid_leaf=1.0)
    feats = np.asarray(estimate_pfh(frame, k=8, grid_leaf=1.0))
    assert feats.shape[1] == PFH_DIM == 125
    sums = feats[np.asarray(frame.mask)].sum(axis=1)
    np.testing.assert_allclose(sums[sums > 0], 100.0, rtol=1e-3)

    # rigid invariance: rotate+translate cloud (and normals), features match
    T = np.asarray(se3.se3_exp(jnp.asarray([0.3, -0.2, 0.5, 2.0, -1.0, 0.5], jnp.float32)))
    pts_t = np.asarray(frame.points) @ T[:3, :3].T + T[:3, 3]  # padded capacity
    normals_t = np.asarray(frame.normals) @ T[:3, :3].T
    frame_t = frame.replace(points=jnp.asarray(pts_t), normals=jnp.asarray(normals_t))
    feats_t = np.asarray(estimate_pfh(frame_t, k=8, grid_leaf=1.0))
    # neighborhoods identical (same grid topology after rigid motion up to
    # voxel re-bucketing); compare where both are populated
    both = (feats.sum(1) > 0) & (feats_t.sum(1) > 0)
    diff = np.abs(feats[both] - feats_t[both]).sum(1)
    assert np.median(diff) < 25.0  # most points keep their histogram


def test_pyramid_registration_converges_wide_basin(kitti_pair):
    """Coarse-to-fine pyramid registration (registration/pyramid.py — the
    bench.py headline path as a library API): batched perturbed inits around
    the known pose all converge within the reference accuracy bounds, and
    single-level GN's basin escapes are absent."""
    from gtsam_points_tpu.registration import build_pyramid, register_scan_pyramid

    target, source0, *_ , T_true = kitti_pair
    # kitti_pair's source was moved AWAY by T_true; move it back near identity
    source = transform_frame(jnp.asarray(T_true), source0)
    maps = jax.jit(lambda f: build_pyramid(f))(target)
    B = 8
    rng = np.random.RandomState(2)
    xis = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)).astype(np.float32))
    T0s = jax.vmap(se3.se3_exp)(xis)
    reg = jax.jit(jax.vmap(lambda T0: register_scan_pyramid(maps, source, T0)))
    Ts = reg(T0s)
    re, te = jax.vmap(lambda T: se3.pose_error(T, jnp.eye(4)))(Ts)
    assert float(jnp.max(re)) < 0.015, f"rot {float(jnp.max(re))}"
    assert float(jnp.max(te)) < 0.15, f"trans {float(jnp.max(te))}"


def test_ransac_taboo_list_excludes_known_pose(kitti_pair):
    """Reference parity (ransac.hpp:26-28, impl/ransac_impl.hpp:149-155): a
    pose on the taboo list — here the CORRECT registration itself — must not
    be returned again; the run yields some other (necessarily worse or
    differently-placed) hypothesis rather than the tabooed one."""
    from gtsam_points_tpu.utils import se3

    target, source, f_t, f_s, T_true = kitti_pair
    params = RANSACParams(max_iterations=8192)

    res = jax.jit(lambda: estimate_pose_ransac(target, source, f_t, f_s, params))()
    check_pose(res.T_target_source, T_true)  # it does find the pose

    res_t = jax.jit(
        lambda T: estimate_pose_ransac(target, source, f_t, f_s, params, taboo=T[None])
    )(res.T_target_source)
    rot_t, trans_t = se3.pose_error(res_t.T_target_source, res.T_target_source)
    # the returned pose is NOT within the taboo ball of the excluded one
    assert (
        float(rot_t) >= params.taboo_thresh_rot
        or float(trans_t) >= params.taboo_thresh_trans
    )
