import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.ops.downsample import random_sampling, randomgrid_sampling, voxelgrid_sampling
from gtsam_points_tpu.types.frame import Frame, make_frame, merge_frames, transform_frame
from gtsam_points_tpu.utils import se3


def random_frame(n=500, seed=0, **attrs):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32) * 5.0
    return make_frame(pts, **attrs), pts


def test_make_frame_padding():
    frame, pts = random_frame(500)
    assert frame.capacity % 256 == 0 and frame.capacity >= 500
    assert int(frame.num_valid()) == 500
    np.testing.assert_allclose(frame.points[:500], pts, atol=1e-6)
    assert not bool(frame.mask[500])


def test_transform_frame():
    rng = np.random.RandomState(1)
    pts = rng.randn(100, 3).astype(np.float32)
    normals = rng.randn(100, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    covs = rng.randn(100, 3, 3).astype(np.float32)
    covs = covs @ covs.transpose(0, 2, 1)
    frame = make_frame(pts, normals=normals, covs=covs)
    T = se3.se3_exp(jnp.array([0.3, -0.2, 0.5, 1.0, -2.0, 0.5]))
    out = transform_frame(T, frame)
    R = np.asarray(T[:3, :3])
    np.testing.assert_allclose(out.points[:100], pts @ R.T + np.asarray(T[:3, 3]), atol=1e-4)
    np.testing.assert_allclose(out.normals[:100], normals @ R.T, atol=1e-5)
    np.testing.assert_allclose(out.covs[:100], np.einsum("ij,njk,lk->nil", R, covs, R), atol=1e-4)


def test_voxel_key_roundtrip():
    rng = np.random.RandomState(2)
    coords = rng.randint(-500, 500, size=(1000, 3)).astype(np.int32)
    keys = vk.pack_coords(jnp.asarray(coords))
    back = vk.unpack_key(keys)
    np.testing.assert_array_equal(back, coords)


def test_voxelgrid_sampling_matches_numpy():
    frame, pts = random_frame(800, seed=3)
    leaf = 1.0
    out = voxelgrid_sampling(frame, leaf)
    # numpy oracle
    coords = np.floor(pts / leaf).astype(np.int64)
    cells = {}
    for p, c in zip(pts, map(tuple, coords)):
        cells.setdefault(c, []).append(p)
    expected = np.array(sorted([np.mean(v, axis=0) for v in cells.values()], key=tuple))
    got = np.asarray(out.points)[np.asarray(out.mask)]
    got = np.array(sorted(got, key=tuple))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_random_sampling():
    frame, _ = random_frame(600, seed=4)
    out = random_sampling(frame, 128, jax.random.PRNGKey(0))
    assert out.capacity == 128
    assert int(out.num_valid()) == 128
    # sampled points are a subset of the original
    orig = set(map(tuple, np.asarray(frame.points[:600]).round(4).tolist()))
    for p in np.asarray(out.points).round(4).tolist():
        assert tuple(p) in orig


def test_randomgrid_sampling_rate():
    frame, _ = random_frame(2000, seed=5)
    out = randomgrid_sampling(frame, leaf=2.0, sampling_rate=0.3, key=jax.random.PRNGKey(1))
    n = int(out.num_valid())
    assert 0 < n <= 2000


def test_merge_frames():
    f1, p1 = random_frame(100, seed=6)
    f2, p2 = random_frame(150, seed=7)
    merged = merge_frames([f1, f2])
    assert int(merged.num_valid()) == 250


def test_remove_outliers_statistical():
    """Statistical outlier removal (reference: find_inlier_points/remove_outliers,
    point_cloud_cpu_funcs.cpp:576+): far-flung points get masked out, the dense
    cloud survives."""
    from gtsam_points_tpu.ops.downsample import remove_outliers

    rng = np.random.RandomState(7)
    dense = (rng.rand(500, 3) * 2.0).astype(np.float32)  # ~unit spacing cloud
    outliers = np.array([[50.0, 50.0, 50.0], [-40.0, 0.0, 0.0], [0.0, 80.0, -3.0]], np.float32)
    frame = make_frame(np.concatenate([dense, outliers]), capacity=768)
    out = remove_outliers(frame, k=8, std_thresh=2.0, grid_leaf=0.5)
    m = np.asarray(out.mask)
    assert not m[500:503].any(), "far outliers must be masked invalid"
    assert m[:500].sum() > 450, "dense cloud must survive"
    # capacity padding stays invalid
    assert not m[503:].any()
