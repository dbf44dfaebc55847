"""Tests for the long-tail components: occupancy grid, incremental covariance
map, IMU reintegration, frame funcs, stats utilities, dogleg, misc factors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors import BetweenFactor, PriorFactor
from gtsam_points_tpu.factors.imu import ReintegratedImuFactor, make_imu_measurements, reintegrate, GRAVITY
from gtsam_points_tpu.factors.misc_factors import Pose3CalibFactor, Pose3InterpolationFactor, RotateVector3Factor
from gtsam_points_tpu.ops.incremental_covariance import (
    empty_incremental_covariance_map,
    insert,
    knn_search_valid,
)
from gtsam_points_tpu.ops.occupancy import build_occupancy_grid, calc_overlap, occupied
from gtsam_points_tpu.optim import FactorGraph, optimize_lm
from gtsam_points_tpu.optim.dogleg import optimize_dogleg
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.types.frame_funcs import median_distance, minmax_distance, sort_by_time
from gtsam_points_tpu.utils import se3
from gtsam_points_tpu.utils.stats import IndexedSlidingWindow, RunningStatistics


def test_occupancy_grid():
    rng = np.random.RandomState(0)
    pts = (rng.rand(500, 3) * 10).astype(np.float32)
    f = make_frame(pts)
    grid = build_occupancy_grid(f.points, f.mask, leaf=0.5)
    occ = occupied(grid, f.points, f.mask)
    assert bool(jnp.all(occ[:500]))
    ov = calc_overlap(grid, f.points, f.mask)
    assert float(ov) == pytest.approx(1.0, abs=1e-6)
    far = make_frame(pts + 100.0)
    assert float(calc_overlap(grid, far.points, far.mask)) == pytest.approx(0.0, abs=1e-6)


def test_incremental_covariance_map():
    rng = np.random.RandomState(1)
    # plane cloud -> valid planar stats
    xy = rng.rand(600, 2).astype(np.float32) * 10
    pts = np.concatenate([xy, rng.randn(600, 1).astype(np.float32) * 0.01], axis=1)
    cmap = empty_incremental_covariance_map(2048)
    cmap = insert(cmap, make_frame(pts[:300]))
    cmap = insert(cmap, make_frame(pts[300:]))
    assert int(jnp.sum(cmap.mask)) == 600
    # most points valid, normals approx +-z
    frac_valid = float(jnp.sum(cmap.valid) / jnp.sum(cmap.mask))
    assert frac_valid > 0.7, frac_valid
    nz = np.abs(np.asarray(cmap.normals)[np.asarray(cmap.valid)][:, 2])
    assert (nz > 0.95).mean() > 0.9
    idx, sq, valid = knn_search_valid(cmap, cmap.points, cmap.mask, 5)
    assert bool(jnp.any(valid))


def test_imu_reintegration_static():
    """Static IMU (measuring -gravity) integrates to identity motion."""
    m = make_imu_measurements(
        stamps=np.arange(0.0, 1.0, 0.01),
        accs=np.tile(-np.asarray([0.0, 0.0, -9.80665]), (100, 1)),
        gyros=np.zeros((100, 3)),
    )
    dR, dp, dv, dt = reintegrate(m, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(dR), np.eye(3), atol=1e-5)
    # body-frame deltas include gravity compensation at prediction time:
    # dp here = ∫∫a = -0.5 g t² (gravity-free frame), cancels in predict()
    factor = ReintegratedImuFactor(
        measurements=m, v_i=jnp.zeros(3), bias_acc=jnp.zeros(3), bias_gyro=jnp.zeros(3),
        weights=jnp.ones(6) * 100.0, pose_keys=(0, 1),
    )
    T_pred, v_pred = factor.predict(jnp.eye(4))
    np.testing.assert_allclose(np.asarray(T_pred), np.eye(4), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_pred), np.zeros(3), atol=1e-4)


def test_imu_factor_constrains_pose():
    """IMU factor pulls pose j to the integrated prediction."""
    rng = np.random.RandomState(2)
    # constant yaw rotation + forward acceleration
    gyros = np.tile([0.0, 0.0, 0.3], (100, 1))
    accs = np.tile([1.0, 0.0, 9.80665], (100, 1))  # body frame approx
    m = make_imu_measurements(np.arange(0.0, 1.0, 0.01), accs, gyros)
    factor = ReintegratedImuFactor(
        measurements=m, v_i=jnp.zeros(3), bias_acc=jnp.zeros(3), bias_gyro=jnp.zeros(3),
        weights=jnp.ones(6) * 100.0, pose_keys=(0, 1),
    )
    T_pred, _ = factor.predict(jnp.eye(4))
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(factor)
    noise = jnp.asarray(rng.randn(6).astype(np.float32) * 0.1)
    poses0 = jnp.stack([jnp.eye(4), T_pred @ se3.se3_exp(noise)])
    res = optimize_lm(graph, poses0)
    rot_e, trans_e = se3.pose_error(T_pred, res.poses[1])
    assert float(rot_e) < 1e-3 and float(trans_e) < 1e-2


def test_dogleg_converges():
    T01 = se3.se3_exp(jnp.array([0.1, -0.05, 0.2, 1.0, 0.5, -0.2]))
    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(BetweenFactor(measured=T01, weights=jnp.ones(6) * 100, target_key=0, source_key=1))
    poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = optimize_dogleg(graph, poses0)
    rot_e, trans_e = se3.pose_error(T01, res.poses[1])
    assert float(rot_e) < 1e-4 and float(trans_e) < 1e-3


def test_misc_factors_jacobians():
    """Calib/interp/rotate factors: error decreases to 0 at the consistent config."""
    Tb = se3.se3_exp(jnp.array([0.1, 0.2, -0.1, 1.0, 0.0, 0.5]))
    Ts = se3.se3_exp(jnp.array([0.0, 0.3, 0.1, 0.2, -0.1, 0.0]))
    calib = Pose3CalibFactor(weights=jnp.ones(6) * 100, pose_keys=(0, 1, 2))
    poses = jnp.stack([Tb, Ts, Tb @ Ts])
    assert float(calib.error(poses)) < 1e-8
    H, b, err = calib.multi_linearize(poses)
    assert H.shape == (18, 18) and float(err) < 1e-8

    interp = Pose3InterpolationFactor(t=jnp.float32(0.5), weights=jnp.ones(6) * 100, pose_keys=(0, 1, 2))
    T_a, T_b = jnp.eye(4), Tb
    xi = se3.se3_log(se3.se3_inverse(T_a) @ T_b)
    T_mid = T_a @ se3.se3_exp(0.5 * xi)
    assert float(interp.error(jnp.stack([T_a, T_b, T_mid]))) < 1e-8

    rot = RotateVector3Factor(
        local=jnp.asarray([0.0, 0.0, 1.0]),
        world=Tb[:3, :3] @ jnp.asarray([0.0, 0.0, 1.0]),
        weights=jnp.ones(3) * 10,
        pose_keys=(0,),
    )
    assert float(rot.error(Tb[None])) < 1e-8


def test_frame_funcs():
    rng = np.random.RandomState(3)
    pts = rng.randn(100, 3).astype(np.float32) * 3
    times = rng.rand(100).astype(np.float32)
    f = make_frame(pts, times=times)
    fs = sort_by_time(f)
    t = np.asarray(fs.times)[np.asarray(fs.mask)]
    assert (np.diff(t) >= 0).all()
    dmin, dmax = minmax_distance(f)
    d = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(float(dmin), d.min(), rtol=1e-5)
    np.testing.assert_allclose(float(dmax), d.max(), rtol=1e-5)
    med = float(median_distance(f, num_samples=128))
    assert 0.5 * np.median(d) < med < 2.0 * np.median(d)


def test_stats_utils():
    rs = RunningStatistics.empty((2,))
    data = np.random.RandomState(4).randn(50, 2).astype(np.float32)
    for row in data:
        rs = rs.add(jnp.asarray(row))
    np.testing.assert_allclose(np.asarray(rs.mean()), data.mean(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rs.std()), data.std(0), atol=1e-3)

    win = IndexedSlidingWindow(max_size=3)
    for i in range(5):
        assert win.push(f"item{i}") == i
    assert win.first_index == 2 and win.last_index == 4
    assert win[3] == "item3"
    assert 1 not in win
    with pytest.raises(IndexError):
        win[0]


def test_frame_aux_attributes_roundtrip(tmp_path):
    """Aux attribute map (reference: PointCloud::aux_attributes,
    types/point_cloud.hpp:57): carried through make/sample/merge and the npz
    round-trip."""
    from gtsam_points_tpu.types.frame import make_frame, merge_frames
    from gtsam_points_tpu.types.frame_funcs import sample
    from gtsam_points_tpu.utils.io import load_frame_npz, save_frame_npz

    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32)
    ring = rng.randint(0, 64, 100).astype(np.float32)
    feat = rng.randn(100, 4).astype(np.float32)
    f = make_frame(pts, capacity=128, aux={"ring": ring, "feat": feat})
    np.testing.assert_allclose(np.asarray(f.aux_attribute("ring"))[:100], ring)
    assert f.aux_attribute("feat").shape == (128, 4)

    picked = sample(f, jnp.asarray([3, 7, 11]))
    np.testing.assert_allclose(np.asarray(picked.aux["ring"]), ring[[3, 7, 11]])

    merged = merge_frames([f, f])
    assert merged.aux["feat"].shape[0] == 256

    path = str(tmp_path / "frame.npz")
    save_frame_npz(path, f)
    f2 = load_frame_npz(path)
    np.testing.assert_allclose(np.asarray(f2.aux["feat"]), np.asarray(f.aux["feat"]))
    import pytest as _pytest

    with _pytest.raises(KeyError):
        f.aux_attribute("missing")


def test_voxelmap_intensity_moments():
    """Voxel maps accumulate per-voxel mean intensity (reference:
    GaussianVoxel intensity accumulation, types/gaussian_voxelmap_cpu.hpp:13-128)
    and expose it through as_frame for colored/intensity factors."""
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.types.frame import make_frame

    rng = np.random.RandomState(1)
    pts = (rng.rand(400, 3) * 5).astype(np.float32)
    inten = rng.rand(400).astype(np.float32)
    frame = make_frame(pts, intensities=inten, capacity=512)
    vmap = build_voxelmap(frame, 1.0)

    # numpy oracle: mean intensity per voxel
    keys = np.floor(pts / 1.0).astype(np.int64)
    kid = keys[:, 0] * 10000 + keys[:, 1] * 100 + keys[:, 2]
    vm_keys = np.asarray(vmap.keys)
    vm_mean_i = np.asarray(vmap.intensity)
    vm_pts = np.asarray(vmap.mean)
    checked = 0
    for u in np.unique(kid)[:50]:
        sel = kid == u
        mu_p = pts[sel].mean(0)
        mu_i = inten[sel].mean()
        d = np.linalg.norm(vm_pts - mu_p, axis=1)
        j = int(np.argmin(d))
        if d[j] < 1e-4:
            np.testing.assert_allclose(vm_mean_i[j], mu_i, rtol=1e-4)
            checked += 1
    assert checked > 20
    vf = vmap.as_frame()
    assert vf.intensities is not None


def test_loam_scan_line_validation():
    """validate_correspondences (reference: integrated_loam_factor.hpp:77-81,
    impl :487-530): edge correspondences whose 2-NN lie on one scan line
    (equal vertical angle) are rejected; cross-line edges survive."""
    from gtsam_points_tpu.factors.loam import PointToEdgeFactor
    from gtsam_points_tpu.ops.hash_grid import build_hash_grid
    from gtsam_points_tpu.types.frame import make_frame

    # target: a horizontal ring of points at constant elevation (all one scan
    # line) + a vertical pole (distinct elevations)
    theta = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    ring = np.stack([5 * np.cos(theta), 5 * np.sin(theta), np.zeros(64)], axis=1).astype(np.float32)
    pole = np.stack([np.full(16, 2.0), np.zeros(16), np.linspace(0.0, 3.0, 16)], axis=1).astype(np.float32)
    target = make_frame(np.concatenate([ring, pole]), capacity=128)
    grid = build_hash_grid(target.points, target.mask, 1.0)

    src_ring = make_frame(ring[:32] + np.float32(0.01), capacity=64)
    src_pole = make_frame(pole + np.float32(0.01), capacity=64)

    def count_ok(source, validate):
        f = PointToEdgeFactor(
            target=target, source=source, grid=grid,
            fixed_target_pose=jnp.eye(4), target_key=-1, source_key=0,
            max_corr_dist=2.0, num_neighbor_cells=27, max_points_per_cell=16,
            validate_scan_lines=validate,
        )
        rf = f.residual_closure(jnp.eye(4), jnp.eye(4))
        _, _, ok = rf(jnp.eye(4), jnp.eye(4))
        return int(jnp.sum(ok))

    # ring sources: neighbors are same-elevation ring points -> all rejected
    assert count_ok(src_ring, validate=False) > 20
    assert count_ok(src_ring, validate=True) == 0
    # pole sources: neighbors at distinct elevations -> survive validation
    assert count_ok(src_pole, validate=True) > 8


def test_offload_pool_lru():
    """Host-offload pool (reference: OffloadableGPU LRU spill,
    types/offloadable.hpp:19-50): cold entries spill to host under a device
    budget, touch reloads with identical contents, LRU order respected."""
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils.memory import nbytes
    from gtsam_points_tpu.utils.offload import OffloadPool

    rng = np.random.RandomState(5)
    maps = {}
    for i in range(3):
        frame = make_frame((rng.rand(512, 3) * 8).astype(np.float32), capacity=512)
        maps[f"m{i}"] = build_voxelmap(frame, 1.0)
    per = nbytes(maps["m0"])

    pool = OffloadPool(device_budget_bytes=int(per * 2.5))
    pool.put("m0", maps["m0"])
    pool.put("m1", maps["m1"])
    assert pool.loaded_on_device("m0") and pool.loaded_on_device("m1")

    pool.put("m2", maps["m2"])  # exceeds budget -> oldest (m0) spills
    assert not pool.loaded_on_device("m0")
    assert pool.loaded_on_device("m1") and pool.loaded_on_device("m2")
    assert pool.memory_usage_device() <= pool.budget

    # touch m0: reloads it, evicts the now-coldest (m1)
    t0 = pool.current_access_time()
    vm0 = pool.touch("m0")
    assert pool.loaded_on_device("m0")
    assert pool.last_accessed_time("m0") > t0
    assert not pool.loaded_on_device("m1")
    # contents identical after the round-trip
    np.testing.assert_array_equal(np.asarray(vm0.keys), np.asarray(maps["m0"].keys))
    np.testing.assert_allclose(np.asarray(vm0.moments), np.asarray(maps["m0"].moments))
    # reload/offload report work-done flags like the reference API
    assert pool.offload("m2") is True
    assert pool.offload("m2") is False
    assert pool.reload("m2") is True


def test_sort_by_voxel_key_preserves_content():
    """sort_by_voxel_key: same point set, keys nondecreasing over valid slots,
    registration-relevant leaves permuted consistently."""
    import numpy as np
    from gtsam_points_tpu.ops import voxel_keys as vk
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.types.frame_funcs import sort_by_voxel_key

    rng = np.random.RandomState(11)
    pts = (rng.rand(300, 3) * 8).astype(np.float32)
    inten = rng.rand(300).astype(np.float32)
    f = make_frame(pts, intensities=inten, capacity=512)
    fs = jax.jit(lambda f: sort_by_voxel_key(f, 1.0))(f)
    assert int(jnp.sum(fs.mask)) == int(jnp.sum(f.mask))
    # same multiset of (point, intensity) pairs
    a = np.asarray(f.points)[np.asarray(f.mask)]
    b = np.asarray(fs.points)[np.asarray(fs.mask)]
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ia = np.sort(np.asarray(f.intensities)[np.asarray(f.mask)])
    ib = np.sort(np.asarray(fs.intensities)[np.asarray(fs.mask)])
    np.testing.assert_array_equal(ia, ib)
    # keys nondecreasing over the valid prefix
    keys = np.asarray(vk.point_keys(fs.points, fs.mask, jnp.float32(1.0)))
    kv = keys[np.asarray(fs.mask)]
    assert (np.diff(kv.astype(np.int64)) >= 0).all()
