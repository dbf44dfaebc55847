"""ISAM2-style incremental API.

Reference: ISAM2Ext (include/gtsam_points/optimizers/isam2_ext.hpp:52,
src/gtsam_points/optimizers/isam2_ext.cpp:425-520) and ISAM2ResultExt
(optimizers/isam2_result_ext.hpp:15-66). The reference maintains a Bayes tree
with fluid relinearization; on TPU, bounded-window dense relinearization in one
fused launch outperforms incremental sparse elimination until very large
windows (SURVEY.md §7.8), so `update()` here re-optimizes the active window
with LM and reports ISAM2-shaped telemetry. Out-of-window variables marginalize
exactly through optim/incremental.py's Schur machinery (used by the
fixed-lag smoother built on top).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.optim.graph import FactorGraph
from gtsam_points_tpu.optim.lm import LMParams, optimize_lm


class ISAM2ResultExt(NamedTuple):
    """Update telemetry (reference: isam2_result_ext.hpp)."""

    error_before: float
    error_after: float
    num_factors: int
    num_values: int
    elapsed_time: float
    num_iterations: int

    def to_string(self) -> str:
        return (
            f"error {self.error_before:.3f} -> {self.error_after:.3f} | "
            f"factors {self.num_factors} | values {self.num_values} | "
            f"iters {self.num_iterations} | {self.elapsed_time * 1e3:.1f} ms"
        )


class ISAM2Ext:
    """Incremental optimizer: push factors + initial values, re-optimize.

    update(new_factors, new_poses) -> ISAM2ResultExt; calculate_estimate()
    returns the current pose array. `relinearize_skip`-style throttling is a
    no-op here (full relinearization is one fused launch).
    """

    def __init__(self, max_poses: int = 256, lm_params: Optional[LMParams] = None):
        self.lm_params = lm_params or LMParams(max_iterations=10)
        self.factors: List = []
        self.poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (max_poses, 1, 1))
        self.num_values = 0

    def update(self, new_factors: List = (), new_values: Optional[dict] = None) -> ISAM2ResultExt:
        t0 = time.perf_counter()
        if new_values:
            for key, pose in new_values.items():
                self.poses = self.poses.at[key].set(jnp.asarray(pose))
                self.num_values = max(self.num_values, key + 1)
        self.factors.extend(new_factors)

        graph = FactorGraph(num_poses=int(self.poses.shape[0]))
        for f in self.factors:
            graph.add(f)
        err_before = float(graph.error(self.poses))
        res = optimize_lm(graph, self.poses, self.lm_params)
        ok = bool(jnp.all(jnp.isfinite(res.poses)))
        if ok:
            self.poses = res.poses
        return ISAM2ResultExt(
            error_before=err_before,
            error_after=float(res.error),
            num_factors=len(self.factors),
            num_values=self.num_values,
            elapsed_time=time.perf_counter() - t0,
            num_iterations=int(res.status.num_iterations),
        )

    def calculate_estimate(self) -> jax.Array:
        return self.poses

    def calculate_estimate_pose(self, key: int) -> np.ndarray:
        return np.asarray(self.poses[key])


class ISAM2ExtDummy(ISAM2Ext):
    """No-op variant (reference: optimizers/isam2_ext_dummy.hpp — debugging
    with optimization disabled): update() records factors/values but never
    optimizes."""

    def update(self, new_factors: List = (), new_values: Optional[dict] = None) -> ISAM2ResultExt:
        t0 = time.perf_counter()
        if new_values:
            for key, pose in new_values.items():
                self.poses = self.poses.at[key].set(jnp.asarray(pose))
                self.num_values = max(self.num_values, key + 1)
        self.factors.extend(new_factors)
        return ISAM2ResultExt(0.0, 0.0, len(self.factors), self.num_values, time.perf_counter() - t0, 0)
