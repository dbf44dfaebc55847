"""Frame: fixed-shape struct-of-arrays point cloud pytree.

TPU-native replacement for the reference's pointer-based PointCloud / frame-traits
duck typing (reference: include/gtsam_points/types/point_cloud.hpp:19-149,
include/gtsam_points/types/frame_traits.hpp:1-201). Every attribute is an
optional dense array padded to a static capacity with a validity mask, so all
downstream kernels are shape-stable under jit. A Frame, a voxel map's voxel
statistics, or a downsampled cloud are all consumed uniformly by the factor
kernels — the pytree *is* the traits layer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.utils import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frame:
    """Point cloud with optional attributes.

    points:      [N, 3] float32
    mask:        [N] bool — validity of each slot (padding is False)
    normals:     [N, 3] float32 or None
    covs:        [N, 3, 3] float32 or None
    intensities: [N] float32 or None
    times:       [N] float32 or None (per-point timestamps, seconds)
    aux:         dict name -> [N, ...] float32, or None — arbitrary per-point
                 auxiliary attributes (reference: PointCloud::aux_attributes,
                 include/gtsam_points/types/point_cloud.hpp:57). Carried as a
                 pytree branch: gathered by sample(), concatenated by
                 merge_frames(), saved/loaded by the npz round-trip; geometric
                 ops leave values untouched.
    """

    points: jax.Array
    mask: jax.Array
    normals: Optional[jax.Array] = None
    covs: Optional[jax.Array] = None
    intensities: Optional[jax.Array] = None
    times: Optional[jax.Array] = None
    aux: Optional[dict] = None

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def replace(self, **kwargs) -> "Frame":
        return dataclasses.replace(self, **kwargs)

    # --- traits-style accessors (mirror frame::point / frame::normal ...) ---
    def has_normals(self) -> bool:
        return self.normals is not None

    def has_covs(self) -> bool:
        return self.covs is not None

    def has_intensities(self) -> bool:
        return self.intensities is not None

    def has_times(self) -> bool:
        return self.times is not None

    def aux_attribute(self, name: str) -> jax.Array:
        """Fetch an aux attribute (reference: PointCloud::aux_attribute)."""
        if self.aux is None or name not in self.aux:
            raise KeyError(f"no aux attribute {name!r}")
        return self.aux[name]


def _round_capacity(n: int, multiple: int = 256) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def make_frame(
    points,
    normals=None,
    covs=None,
    intensities=None,
    times=None,
    capacity: Optional[int] = None,
    pad_multiple: int = 256,
    aux: Optional[dict] = None,
) -> Frame:
    """Build a Frame from host arrays, padding to a lane-friendly capacity.

    Padding slots hold the first valid point (not zeros) so that accidental
    distance computations against padding do not produce spurious near-origin
    matches; the mask is authoritative.
    """
    points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    n = points.shape[0]
    cap = capacity if capacity is not None else _round_capacity(n, pad_multiple)
    if cap < n:
        raise ValueError(f"capacity {cap} < num points {n}")

    def pad(arr, fill_from_first=False):
        if arr is None:
            return None
        arr = np.asarray(arr, dtype=np.float32)
        if arr.shape[0] != n:
            raise ValueError(f"attribute length {arr.shape[0]} != {n}")
        out = np.zeros((cap,) + arr.shape[1:], dtype=np.float32)
        out[:n] = arr
        if fill_from_first and n > 0:
            out[n:] = arr[0]
        return jnp.asarray(out)

    mask = np.zeros((cap,), dtype=bool)
    mask[:n] = True
    return Frame(
        points=pad(points, fill_from_first=True),
        mask=jnp.asarray(mask),
        normals=pad(normals),
        covs=pad(covs),
        intensities=pad(intensities),
        times=pad(times),
        aux=None if aux is None else {k: pad(v) for k, v in aux.items()},
    )


def transform_frame(T: jax.Array, frame: Frame) -> Frame:
    """Rigidly transform a frame (points, normals, covs rotate; reference:
    src/gtsam_points/types/point_cloud_cpu_funcs.cpp:469-556)."""
    R = T[..., :3, :3]
    new_points = se3.transform_points(T, frame.points)
    new_normals = None if frame.normals is None else se3.rotate_points(T, frame.normals)
    new_covs = None
    if frame.covs is not None:
        new_covs = jnp.einsum("...ij,...njk,...lk->...nil", R, frame.covs, R)
    return frame.replace(points=new_points, normals=new_normals, covs=new_covs)


def merge_frames(frames, capacity: Optional[int] = None) -> Frame:
    """Concatenate frames (reference: merge_frames,
    src/gtsam_points/types/point_cloud_cpu_funcs.cpp). Attributes kept only if
    present on all inputs."""

    def cat(name):
        vals = [getattr(f, name) for f in frames]
        if any(v is None for v in vals):
            return None
        return jnp.concatenate(vals, axis=0)

    points = cat("points")
    mask = jnp.concatenate([f.mask for f in frames], axis=0)
    aux = None
    if all(f.aux is not None for f in frames):
        common = set(frames[0].aux)
        for f in frames[1:]:
            common &= set(f.aux)
        aux = {k: jnp.concatenate([f.aux[k] for f in frames], axis=0) for k in sorted(common)}
    out = Frame(
        points=points,
        mask=mask,
        normals=cat("normals"),
        covs=cat("covs"),
        intensities=cat("intensities"),
        times=cat("times"),
        aux=aux,
    )
    if capacity is not None:
        out = pad_frame(out, capacity)
    return out


def pad_frame(frame: Frame, capacity: int) -> Frame:
    """Pad or truncate (valid-first) a frame to a new capacity."""
    n = frame.capacity
    if capacity == n:
        return frame

    def fix(arr, fill=0.0):
        if arr is None:
            return None
        if capacity > n:
            pad_width = [(0, capacity - n)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, pad_width, constant_values=fill)
        return arr[:capacity]

    return Frame(
        points=fix(frame.points),
        mask=fix(frame.mask, fill=False),
        normals=fix(frame.normals),
        covs=fix(frame.covs),
        intensities=fix(frame.intensities),
        times=fix(frame.times),
        aux=None if frame.aux is None else {k: fix(v) for k, v in frame.aux.items()},
    )


def masked_points(frame: Frame, fill: float = jnp.inf) -> jax.Array:
    """Points with padding slots pushed to `fill` (for NN search)."""
    return jnp.where(frame.mask[:, None], frame.points, fill)
