"""Host-side IO for the binary point formats used by the reference datasets.

Formats (reference: include/gtsam_points/util/read_points.hpp:13-63):
- `read_times`:  flat float32 array.
- `read_points`: packed float32 xyz triplets.
- `read_points4`: packed float32 xyzw quadruplets (KITTI .bin = xyz+intensity).
- `graph.txt`:  lines "v<id> x y z qx qy qz qw" (ground-truth poses).

Also npz-based save/load for frames and voxel maps (the TPU-native analogue of
PointCloud::save/save_compact, reference: include/gtsam_points/types/point_cloud.hpp:90-100).
"""

from __future__ import annotations

import os

import numpy as np


def read_times(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32)


def read_points(path: str) -> np.ndarray:
    """Packed float32 xyz -> [N, 3]."""
    data = np.fromfile(path, dtype=np.float32)
    return data.reshape(-1, 3)


def read_points4(path: str) -> np.ndarray:
    """Packed float32 xyzw (KITTI: xyz + intensity) -> [N, 4]."""
    data = np.fromfile(path, dtype=np.float32)
    return data.reshape(-1, 4)


def read_kitti_bin(path: str):
    """KITTI velodyne .bin -> (points [N,3], intensities [N])."""
    data = read_points4(path)
    return data[:, :3].copy(), data[:, 3].copy()


def load_graph(path: str) -> np.ndarray:
    """graph.txt -> [P, 7] rows of (x, y, z, qx, qy, qz, qw), ordered by vertex id."""
    rows = {}
    with open(path) as f:
        for line in f:
            tok = line.split()
            if len(tok) != 8 or not tok[0].startswith("v"):
                continue
            rows[int(tok[0][1:])] = [float(x) for x in tok[1:]]
    return np.asarray([rows[i] for i in sorted(rows)], dtype=np.float32)


def save_frame_npz(path: str, frame) -> None:
    arrays = {}
    for name in ("points", "mask", "normals", "covs", "intensities", "times"):
        value = getattr(frame, name)
        if value is not None:
            arrays[name] = np.asarray(value)
    if getattr(frame, "aux", None):
        for k, v in frame.aux.items():
            arrays[f"aux__{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_frame_npz(path: str):
    from gtsam_points_tpu.types.frame import Frame

    import jax.numpy as jnp

    data = np.load(path)
    kwargs = {k: jnp.asarray(data[k]) for k in data.files if not k.startswith("aux__")}
    aux = {k[len("aux__"):]: jnp.asarray(data[k]) for k in data.files if k.startswith("aux__")}
    return Frame(**kwargs, aux=aux or None)


def data_root() -> str:
    """Root of the bundled reference datasets (read-only)."""
    return os.environ.get("GTSAM_POINTS_DATA", "/root/reference/data")
