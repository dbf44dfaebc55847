"""Tests for segmentation (region growing, min-cut), the DDA voxel raycaster,
and the voxelmap overlap family.

Reference patterns: src/test/test_voxel_raycaster.cpp:42-95 (corner cases),
src/demo/demo_segmentation.cpp (seeded cluster extraction), and the overlap
family in src/gtsam_points/types/gaussian_voxelmap_cpu_funcs.cpp:126-190.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _two_planes(n=1024, gap=3.0, seed=0):
    """Two parallel square planes separated along z by `gap`."""
    rng = np.random.RandomState(seed)
    a = np.zeros((n, 3), np.float32)
    a[:, :2] = rng.rand(n, 2) * 4 - 2
    b = a.copy()
    b[:, 2] = gap
    a[:, 2] += rng.randn(n).astype(np.float32) * 0.01
    b[:, 2] += rng.randn(n).astype(np.float32) * 0.01
    return a, b


def test_region_growing_separates_planes():
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.segmentation import RegionGrowingParams, region_growing
    from gtsam_points_tpu.types.frame import make_frame

    a, b = _two_planes()
    pts = np.concatenate([a, b])
    frame = make_frame(pts, capacity=2048)
    frame = estimate_normals_covs(frame, k=10, grid_leaf=0.5)

    labels = np.asarray(
        region_growing(frame, jnp.asarray([0.0, 0.0, 0.0]), RegionGrowingParams(distance_thresh=0.5))
    )
    mask = np.asarray(frame.mask)
    # everything on plane a labeled, nothing on plane b
    in_a = labels[: len(a)]
    in_b = labels[len(a) : len(pts)]
    assert in_a[mask[: len(a)]].mean() > 0.95
    assert in_b[mask[len(a) : len(pts)]].mean() < 0.05


def test_min_cut_extracts_cluster():
    pytest.importorskip("scipy")
    from gtsam_points_tpu.segmentation import MinCutParams, min_cut
    from gtsam_points_tpu.types.frame import make_frame

    rng = np.random.RandomState(1)
    fg = rng.randn(400, 3).astype(np.float32) * 0.3  # tight cluster at origin
    bg = rng.randn(400, 3).astype(np.float32) * 0.3 + np.array([6.0, 0, 0], np.float32)
    pts = np.concatenate([fg, bg])
    frame = make_frame(pts, capacity=1024)

    labels = min_cut(
        frame,
        np.zeros(3, np.float32),
        MinCutParams(foreground_radius=1.0, background_radius=3.5, grid_leaf=0.4),
    )
    mask = np.asarray(frame.mask)
    assert labels[:400][mask[:400]].mean() > 0.9
    assert labels[400:800][mask[400:800]].mean() < 0.1


def test_raycast_straight_axis():
    from gtsam_points_tpu.utils.raycast import raycast_voxels

    o = jnp.asarray([[0.05, 0.05, 0.05]])
    t = jnp.asarray([[0.45, 0.05, 0.05]])
    coords, valid = raycast_voxels(o, t, leaf=0.1, max_steps=8)
    c = np.asarray(coords[0])[np.asarray(valid[0])]
    # visits cells x=0..3 (start inclusive, target cell x=4 exclusive)
    assert c.shape[0] == 4
    np.testing.assert_array_equal(c[:, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(c[:, 1:], 0)


def test_raycast_diagonal_and_negative():
    from gtsam_points_tpu.utils.raycast import raycast_voxels

    o = jnp.asarray([[0.95, 0.95, 0.95], [-0.05, -0.05, -0.05]])
    t = jnp.asarray([[-0.95, -0.95, -0.95], [-0.05, -0.05, -0.95]])
    coords, valid = raycast_voxels(o, t, leaf=0.5, max_steps=32)
    for r in range(2):
        c = np.asarray(coords[r])[np.asarray(valid[r])]
        assert c.shape[0] >= 1
        # every step moves exactly one axis by ±1 (DDA invariant)
        d = np.abs(np.diff(c, axis=0)).sum(axis=1)
        assert np.all(d == 1)
    # negative-coordinate ray starts in voxel (-1,-1,-1)
    c1 = np.asarray(coords[1])[np.asarray(valid[1])]
    np.testing.assert_array_equal(c1[0], [-1, -1, -1])


def test_raycast_same_voxel_emits_nothing():
    from gtsam_points_tpu.utils.raycast import raycast_voxels

    o = jnp.asarray([[0.2, 0.2, 0.2]])
    t = jnp.asarray([[0.3, 0.3, 0.3]])
    _, valid = raycast_voxels(o, t, leaf=1.0, max_steps=4)
    assert not bool(np.asarray(valid).any())


def test_overlap_and_overlap_auto():
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.types.frame_funcs import overlap, overlap_auto

    rng = np.random.RandomState(2)
    pts = (rng.rand(2000, 3) * 10).astype(np.float32)
    frame = make_frame(pts, capacity=2048)
    vmap = jax.jit(lambda f: build_voxelmap(f, 0.5))(frame)

    I = jnp.eye(4)
    ov_self = float(overlap(vmap, frame, I))
    assert ov_self > 0.99

    # shift far away -> near-zero overlap
    T_far = I.at[:3, 3].set(jnp.asarray([100.0, 0, 0]))
    assert float(overlap(vmap, frame, T_far)) < 0.01

    # union of (far map, self map) recovers full overlap
    ov_union = float(overlap_auto([vmap, vmap], frame, [T_far, I]))
    assert ov_union > 0.99
