"""Voxel map structural tests (reference pattern: src/test/test_voxelmap.cpp —
contents vs numpy oracle, incremental insertion, LRU behavior, save/load
round-trip, overlap)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.ops import voxel_keys as vk
from gtsam_points_tpu.ops.voxelmap import (
    build_voxelmap,
    empty_voxelmap,
    insert_frame,
    load_voxelmap,
    lookup_voxels,
    save_voxelmap,
    voxelmap_overlap,
)
from gtsam_points_tpu.types.frame import make_frame
from gtsam_points_tpu.utils import se3


def numpy_voxel_stats(pts, leaf):
    coords = np.floor(pts / leaf).astype(np.int64)
    cells = {}
    for p, c in zip(pts, map(tuple, coords)):
        cells.setdefault(c, []).append(p)
    return {
        c: (len(v), np.mean(v, axis=0), np.cov(np.asarray(v).T, bias=True) if len(v) > 1 else np.zeros((3, 3)))
        for c, v in cells.items()
    }


def test_build_matches_numpy():
    rng = np.random.RandomState(0)
    pts = (rng.rand(500, 3) * 8).astype(np.float32)
    frame = make_frame(pts)
    vmap = build_voxelmap(frame, leaf=1.0)
    oracle = numpy_voxel_stats(pts, 1.0)
    keys = np.asarray(vmap.keys)
    valid = keys != int(vk.INVALID_KEY)
    assert valid.sum() == len(oracle)
    coords = np.asarray(vk.unpack_key(vmap.keys))
    for i in np.nonzero(valid)[0]:
        c = tuple(coords[i].astype(np.int64))
        cnt, mean, cov = oracle[c]
        assert int(np.asarray(vmap.count)[i]) == cnt
        np.testing.assert_allclose(np.asarray(vmap.mean)[i], mean, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vmap.cov)[i], cov, atol=1e-3)


def test_incremental_insert_equals_batch():
    rng = np.random.RandomState(1)
    pts = (rng.rand(600, 3) * 6).astype(np.float32)
    f_all = make_frame(pts)
    f1 = make_frame(pts[:300])
    f2 = make_frame(pts[300:])
    vm_batch = build_voxelmap(f_all, leaf=1.0, capacity=1024)
    vm_inc = empty_voxelmap(1.0, 1024)
    vm_inc = insert_frame(vm_inc, f1)
    vm_inc = insert_frame(vm_inc, f2)
    kb = np.asarray(vm_batch.keys)
    ki = np.asarray(vm_inc.keys)
    vb = kb != int(vk.INVALID_KEY)
    vi = ki != int(vk.INVALID_KEY)
    assert vb.sum() == vi.sum()
    np.testing.assert_array_equal(np.sort(kb[vb]), np.sort(ki[vi]))
    # stats match after merge
    order_b = np.argsort(kb[vb])
    order_i = np.argsort(ki[vi])
    np.testing.assert_allclose(
        np.asarray(vm_batch.mean)[vb][order_b], np.asarray(vm_inc.mean)[vi][order_i], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(vm_batch.cov)[vb][order_b], np.asarray(vm_inc.cov)[vi][order_i], atol=1e-3
    )


def test_lru_eviction():
    """Over-capacity insertion keeps the most recent voxels (reference:
    iVox lru_horizon eviction, ann/impl/incremental_voxelmap_impl.hpp:49-62)."""
    cap = 64
    vm = empty_voxelmap(1.0, cap)
    rng = np.random.RandomState(2)
    # epoch 1: 60 voxels around origin
    pts1 = (rng.rand(256, 3) * 4).astype(np.float32)
    vm = insert_frame(vm, make_frame(pts1, capacity=256))
    # epoch 2: 60 distinct voxels far away -> must evict old ones
    pts2 = (rng.rand(256, 3) * 4 + 50).astype(np.float32)
    vm = insert_frame(vm, make_frame(pts2, capacity=256))
    keys = np.asarray(vm.keys)
    valid = keys != int(vk.INVALID_KEY)
    assert valid.sum() <= cap
    coords = np.asarray(vk.unpack_key(vm.keys))[valid]
    # all surviving voxels from the most recent epoch are retained preferentially
    seen = np.asarray(vm.last_seen)[valid]
    n_new = (seen == 2).sum()
    assert n_new == min((np.floor(pts2).astype(np.int64) // 1).shape[0], cap) or n_new > 0
    # the newest epoch dominates the table
    assert n_new >= valid.sum() - n_new


def test_lookup_and_overlap():
    rng = np.random.RandomState(3)
    pts = (rng.rand(400, 3) * 8).astype(np.float32)
    frame = make_frame(pts)
    vmap = build_voxelmap(frame, leaf=1.0)
    idx, found = lookup_voxels(vmap, frame.points, frame.mask)
    assert bool(jnp.all(found[: 400]))
    # overlap of the same frame at identity = 1.0
    ov = voxelmap_overlap(vmap, frame, jnp.eye(4))
    assert float(ov) == pytest.approx(1.0, abs=1e-6)
    # far translation -> 0 overlap
    T_far = se3.make_transform(jnp.eye(3), jnp.array([100.0, 0.0, 0.0]))
    ov_far = voxelmap_overlap(vmap, frame, T_far)
    assert float(ov_far) == pytest.approx(0.0, abs=1e-6)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    pts = (rng.rand(300, 3) * 5).astype(np.float32)
    vmap = build_voxelmap(make_frame(pts), leaf=0.5)
    path = os.path.join(tmp_path, "vm.npz")
    save_voxelmap(path, vmap)
    vm2 = load_voxelmap(path)
    for a, b in zip(vmap, vm2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_insert_frame_incremental_matches_structural():
    """Incremental append must agree with the structural merge on contents:
    same voxel set, same per-voxel moments, lookups find the same cells."""
    import jax
    import jax.numpy as jnp

    from gtsam_points_tpu.ops.voxelmap import (
        build_voxelmap,
        empty_voxelmap,
        insert_frame,
        insert_frame_incremental,
        lookup_fetch,
    )
    from gtsam_points_tpu.types.frame import make_frame

    rng = np.random.RandomState(0)
    a = (rng.rand(500, 3) * 8).astype(np.float32)
    b = (rng.rand(400, 3) * 8 + 4).astype(np.float32)  # overlaps half of a
    fa = make_frame(a, capacity=512)
    fb = make_frame(b, capacity=512)

    vm = empty_voxelmap(1.0, 4096)
    vm = insert_frame(vm, fa)
    vm_inc, overflow = jax.jit(insert_frame_incremental)(vm, fb)
    assert not bool(overflow)
    vm_str = insert_frame(vm, fb)

    assert int(vm_inc.num_voxels) == int(vm_str.num_voxels)
    # same lookup results for every inserted point (count + mean agree)
    for f in (fa, fb):
        fi, ci, mi, _ = lookup_fetch(vm_inc, f.points, f.mask)
        fs, cs, ms, _ = lookup_fetch(vm_str, f.points, f.mask)
        assert bool(jnp.all(fi == fs))
        np.testing.assert_allclose(np.asarray(ci)[np.asarray(fi)], np.asarray(cs)[np.asarray(fs)])
        np.testing.assert_allclose(
            np.asarray(mi)[np.asarray(fi)], np.asarray(ms)[np.asarray(fs)], atol=1e-5
        )


def test_insert_frame_incremental_overflow_flag():
    import jax
    import numpy as np

    from gtsam_points_tpu.ops.voxelmap import empty_voxelmap, insert_frame_incremental
    from gtsam_points_tpu.types.frame import make_frame

    rng = np.random.RandomState(1)
    pts = (rng.rand(600, 3) * 50).astype(np.float32)  # ~ >512 distinct 1m voxels
    vm = empty_voxelmap(1.0, 256)
    vm2, overflow = jax.jit(insert_frame_incremental)(vm, make_frame(pts, capacity=1024))
    assert bool(overflow)
    assert int(vm2.num_voxels) == 256


def test_colored_gicp_against_voxelmap():
    """Colored registration against a VOXEL MAP: voxel intensity moments +
    as_frame(with_normals=True) feed the colored GICP factor directly
    (reference: GaussianVoxel intensity accumulation enables the same,
    types/gaussian_voxelmap_cpu.hpp:13-128)."""
    import jax

    from gtsam_points_tpu.factors import PriorFactor
    from gtsam_points_tpu.factors.colored import make_colored_gicp_factor
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.optim.lm import LMParams
    from gtsam_points_tpu.utils import se3

    rng = np.random.RandomState(3)
    # smooth surface with an intensity pattern that breaks translation slip
    xy = (rng.rand(4000, 2) * 8 - 4).astype(np.float32)
    z = (0.1 * np.sin(xy[:, 0]) + 0.05 * xy[:, 1]).astype(np.float32)
    pts = np.concatenate([xy, z[:, None]], axis=1)
    inten = (np.sin(2.0 * xy[:, 0]) * np.cos(2.0 * xy[:, 1])).astype(np.float32)
    covs = np.tile((0.01 * np.eye(3, dtype=np.float32))[None], (4000, 1, 1))
    target = make_frame(pts, covs=covs, intensities=inten, capacity=4096)

    vmap = build_voxelmap(target, 0.5)
    vframe = vmap.as_frame(with_normals=True)
    assert vframe.intensities is not None and vframe.normals is not None

    xi = np.asarray([0.01, -0.01, 0.02, 0.15, -0.1, 0.05], dtype=np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    src_pts = np.asarray(se3.transform_points(se3.se3_inverse(T), jnp.asarray(pts)))
    source = make_frame(src_pts, covs=covs, intensities=inten, capacity=4096)

    graph = FactorGraph(num_poses=2)
    graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
    graph.add(
        make_colored_gicp_factor(0, 1, vframe, source, max_corr_dist=1.0, grid_leaf=0.5)
    )
    poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
    res = jax.jit(lambda p: optimize_lm(graph, p, LMParams(max_iterations=20)))(poses0)
    rot_e, trans_e = se3.pose_error(T, res.poses[1])
    assert float(rot_e) < 5e-3 and float(trans_e) < 5e-2, (float(rot_e), float(trans_e))
