"""Point-cloud utility functions completing the reference's free-function set
(reference: src/gtsam_points/types/point_cloud_cpu_funcs.cpp:27-685 —
sample, sort_by_time, distances/minmax/median, overlap family)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.types.frame import Frame


def sample(frame: Frame, indices: jax.Array) -> Frame:
    """Pick points by index (reference: sample, :27). Indices must be valid."""

    def take(arr):
        return None if arr is None else arr[indices]

    return Frame(
        points=take(frame.points),
        mask=take(frame.mask),
        normals=take(frame.normals),
        covs=take(frame.covs),
        intensities=take(frame.intensities),
        times=take(frame.times),
        aux=None if frame.aux is None else {k: take(v) for k, v in frame.aux.items()},
    )


def sort_by_time(frame: Frame) -> Frame:
    """Stable sort by per-point timestamp (reference: sort_by_time, :459);
    invalid slots sort last."""
    if frame.times is None:
        raise ValueError("sort_by_time requires times")
    key = jnp.where(frame.mask, frame.times, jnp.inf)
    order = jnp.argsort(key, stable=True)
    return sample(frame, order)


def sort_by_voxel_key(frame: Frame, leaf) -> Frame:
    """Sort points by packed voxel key (invalid slots last).

    A gather-locality utility with no reference counterpart: scan-to-map
    correspondence is one row gather per point from the map's sorted-key
    table, and raw scans arrive in beam order, so key-sorting the SOURCE
    makes the per-iteration gather row indices near-monotone. Measured
    NEUTRAL on TPU v5e at the bench scale (25k-voxel map ≈ 1.6 MB — the
    gather stream is already served efficiently); expected to matter only
    for much-larger-than-cache maps. Registration results are identical
    (the reduction is order-invariant up to f32 rounding)."""
    from gtsam_points_tpu.ops import voxel_keys as vk

    keys = vk.point_keys(frame.points, frame.mask, leaf)
    order = jnp.argsort(jnp.where(frame.mask, keys, jnp.int32(2**31 - 1)), stable=True)
    return sample(frame, order)


def point_distances(frame: Frame) -> jax.Array:
    """Range of each point from the origin (invalid -> 0)."""
    d = jnp.linalg.norm(frame.points, axis=-1)
    return jnp.where(frame.mask, d, 0.0)


def minmax_distance(frame: Frame):
    d = jnp.linalg.norm(frame.points, axis=-1)
    dmin = jnp.min(jnp.where(frame.mask, d, jnp.inf))
    dmax = jnp.max(jnp.where(frame.mask, d, -jnp.inf))
    return dmin, dmax


def median_distance(frame: Frame, num_samples: int = 256) -> jax.Array:
    """Approximate median range via evenly-strided samples (reference computes
    the exact median on a subset too)."""
    d = jnp.linalg.norm(frame.points, axis=-1)
    d = jnp.where(frame.mask, d, jnp.nan)
    stride = max(frame.capacity // num_samples, 1)
    return jnp.nanmedian(d[::stride])


def overlap(target_voxelmap, source: Frame, T) -> jax.Array:
    """Fraction of source points landing in target voxels (reference: overlap,
    src/gtsam_points/types/gaussian_voxelmap_cpu_funcs.cpp:126-190)."""
    from gtsam_points_tpu.ops.voxelmap import voxelmap_overlap

    return voxelmap_overlap(target_voxelmap, source, T)


def overlap_auto(target_voxelmaps, source: Frame, Ts) -> jax.Array:
    """Overlap of a source against the union of several voxelmaps
    (reference: overlap(vector<voxelmaps>...) / overlap_auto)."""
    import jax.numpy as jnp

    from gtsam_points_tpu.ops.voxelmap import lookup_voxels
    from gtsam_points_tpu.utils import se3

    found_any = jnp.zeros(source.capacity, dtype=bool)
    for vm, T in zip(target_voxelmaps, Ts):
        pts = se3.transform_points(T, source.points)
        _, found = lookup_voxels(vm, pts, source.mask)
        found_any = found_any | found
    n = jnp.maximum(source.num_valid(), 1)
    return jnp.sum(found_any.astype(jnp.float32)) / n
