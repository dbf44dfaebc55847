"""ctypes bindings to the native host runtime (native/src/host_ops.cpp).

Provides fast host-side IO, an exact KdTree kNN (used as the oracle the
reference validates against, src/test/test_kdtree.cpp), and voxel
downsampling for the data-loading path. Every entry point has a NumPy
fallback so the package works without the compiled library.

Build: `make -C native` or cmake; the .so lands next to this file.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgtsam_points_host.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gpt_read_floats.restype = ctypes.c_int64
    lib.gpt_read_floats.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.gpt_kdtree_build.restype = ctypes.c_void_p
    lib.gpt_kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.gpt_kdtree_free.argtypes = [ctypes.c_void_p]
    lib.gpt_kdtree_knn.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gpt_voxelgrid.restype = ctypes.c_int64
    lib.gpt_voxelgrid.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_floats(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=np.float32)
    n = lib.gpt_read_floats(path.encode(), None, 0)
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty(n, dtype=np.float32)
    got = lib.gpt_read_floats(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return out[:got]


class HostKdTree:
    """Exact KdTree over [N,3] float32 points (native; NumPy brute-force fallback)."""

    def __init__(self, points: np.ndarray):
        self.points = np.ascontiguousarray(points, dtype=np.float32)
        lib = _load()
        self._lib = lib
        self._handle = None
        if lib is not None:
            self._handle = lib.gpt_kdtree_build(
                self.points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(self.points)
            )

    def knn(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        q = len(queries)
        if self._handle is not None:
            idx = np.empty((q, k), dtype=np.int32)
            sq = np.empty((q, k), dtype=np.float32)
            self._lib.gpt_kdtree_knn(
                self._handle,
                queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                q,
                k,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                sq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return idx, sq
        d = ((queries[:, None, :] - self.points[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d, axis=1)[:, :k].astype(np.int32)
        return idx, np.take_along_axis(d, idx, axis=1).astype(np.float32)

    def __del__(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.gpt_kdtree_free(self._handle)


def voxelgrid_downsample(points: np.ndarray, leaf: float, capacity: Optional[int] = None) -> np.ndarray:
    points = np.ascontiguousarray(points, dtype=np.float32)
    cap = capacity if capacity is not None else len(points)
    lib = _load()
    if lib is not None:
        out = np.empty((cap, 3), dtype=np.float32)
        n = lib.gpt_voxelgrid(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(points),
            leaf,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap,
        )
        return out[:n].copy()
    coords = np.floor(points / leaf).astype(np.int64)
    _, inv, cnt = np.unique(coords, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((len(cnt), 3), dtype=np.float64)
    np.add.at(sums, inv, points)
    return (sums / cnt[:, None]).astype(np.float32)[:cap]
