"""ISAM2-style incremental optimizer: bounded window + exact Schur marginals.

Reference: ISAM2Ext (include/gtsam_points/optimizers/isam2_ext.hpp:52,
src/gtsam_points/optimizers/isam2_ext.cpp:425-520) maintains a Bayes tree with
fluid relinearization so per-update cost is bounded by the affected sub-tree.
The TPU-idiomatic equivalent implemented here bounds per-update cost with a
sliding window instead of a tree:

- At most `window_size` poses stay active; older poses are marginalized by
  Schur complement into a dense MarginalPriorFactor (exact at the
  linearization point, like the reference's fixed-lag marginalization), their
  estimates frozen.
- Every update re-linearizes the whole active window in ONE fused jitted LM
  program — dense relinearization of a bounded window beats incremental
  sparse elimination on TPU until windows are very large (SURVEY.md §7.8).
- The jitted program is cached by graph STRUCTURE: factors are passed as
  pytree arguments (not closed-over constants) and window keys are remapped to
  stable local slots (factors/base.remap_keys), so in steady state — e.g.
  sequential scan-matching factors plus a marginal prior — update t+1 reuses
  update t's compiled executable. `num_compiles` counts actual XLA builds.

Telemetry mirrors ISAM2ResultExt (optimizers/isam2_result_ext.hpp:15-66).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.factors.base import remap_keys
from gtsam_points_tpu.optim.graph import FactorGraph
from gtsam_points_tpu.optim.incremental import (
    MarginalPriorFactor,
    marginalize_system,
)
from gtsam_points_tpu.optim.lm import LMParams, LMResult, optimize_lm


class ISAM2ResultExt(NamedTuple):
    """Update telemetry (reference: isam2_result_ext.hpp)."""

    error_before: float
    error_after: float
    num_factors: int
    num_values: int
    elapsed_time: float
    num_iterations: int
    num_relinearized: int = 0  # active window size this update
    num_marginalized: int = 0  # poses frozen this update
    compiled: bool = False  # True iff this update built a new XLA program

    def to_string(self) -> str:
        return (
            f"error {self.error_before:.3f} -> {self.error_after:.3f} | "
            f"factors {self.num_factors} | values {self.num_values} | "
            f"window {self.num_relinearized} | marg {self.num_marginalized} | "
            f"iters {self.num_iterations} | "
            f"{'compile ' if self.compiled else ''}{self.elapsed_time * 1e3:.1f} ms"
        )


def _avals_key(leaves) -> Tuple:
    return tuple((x.shape, str(x.dtype)) for x in leaves)


class _ProgramCache:
    """jit executables keyed by (treedef, leaf avals, static config). One entry
    == one XLA program; `compiles` counts builds (the no-recompile contract the
    reference gets from reusing its Bayes tree between updates)."""

    def __init__(self):
        self._cache: Dict = {}
        self.compiles = 0

    def get(self, key, builder):
        entry = self._cache.get(key)
        if entry is None:
            entry = jax.jit(builder())
            self._cache[key] = entry
            self.compiles += 1
            return entry, True
        return entry, False


class ISAM2Ext:
    """Incremental optimizer: push factors + initial values, optimize the
    bounded active window, marginalize what falls out.

    update(new_factors, new_values) -> ISAM2ResultExt; calculate_estimate()
    returns every pose (frozen ones at their marginalization-time values).

    Factors may reference frozen poses only as a matching-cost factor's
    `target_key`; the frozen estimate is then baked in as the factor's fixed
    target pose (unary mode). Anything else raises — widen the window.
    """

    def __init__(
        self,
        window_size: int = 8,
        lm_params: Optional[LMParams] = None,
        max_poses: Optional[int] = None,
    ):
        if max_poses is not None:  # legacy alias: capacity == window bound
            window_size = max_poses
        if window_size < 2:
            raise ValueError("window_size must be >= 2")
        self.window_size = window_size
        self.lm_params = lm_params or LMParams(max_iterations=10)
        self.factors: List = []  # active factors (incl. marginal priors), global keys
        self.estimates: Dict[int, np.ndarray] = {}  # key -> 4x4 (active + frozen)
        self.window: List[int] = []  # ordered active global keys
        self.frozen: Dict[int, np.ndarray] = {}
        self.num_values = 0
        self._programs = _ProgramCache()

    # -- public API ---------------------------------------------------------

    @property
    def num_compiles(self) -> int:
        return self._programs.compiles

    def update(self, new_factors: List = (), new_values: Optional[dict] = None) -> ISAM2ResultExt:
        t0 = time.perf_counter()
        if new_values:
            for key in sorted(new_values):
                self.estimates[key] = np.asarray(new_values[key], dtype=np.float32)
                if key not in self.window and key not in self.frozen:
                    self.window.append(key)
                self.num_values = max(self.num_values, key + 1)
        self.factors.extend(self._adopt(f) for f in new_factors)

        n_marg = len(self.window) - self.window_size
        if n_marg > 0:
            self._marginalize(self.window[:n_marg])
        else:
            n_marg = 0

        err_before, err_after, iters, compiled = self._optimize()
        return ISAM2ResultExt(
            error_before=err_before,
            error_after=err_after,
            num_factors=len(self.factors),
            num_values=self.num_values,
            elapsed_time=time.perf_counter() - t0,
            num_iterations=iters,
            num_relinearized=len(self.window),
            num_marginalized=n_marg,
            compiled=compiled,
        )

    def calculate_estimate(self) -> np.ndarray:
        """All pose estimates stacked [num_values, 4, 4] (frozen poses at their
        marginalization-time values; never-seen keys identity)."""
        out = np.tile(np.eye(4, dtype=np.float32), (max(self.num_values, 1), 1, 1))
        for k, T in self.estimates.items():
            out[k] = T
        return out

    def calculate_estimate_dict(self) -> Dict[int, np.ndarray]:
        return dict(self.estimates)

    def calculate_estimate_pose(self, key: int) -> np.ndarray:
        return np.asarray(self.estimates[key])

    # -- internals ----------------------------------------------------------

    def _adopt(self, factor):
        """Validate keys; bake frozen target poses into unary mode."""
        frozen_keys = [k for k in factor.keys if k >= 0 and k in self.frozen]
        if not frozen_keys:
            return factor
        if (
            hasattr(factor, "target_key")
            and hasattr(factor, "fixed_target_pose")
            and frozen_keys == [factor.target_key]
        ):
            return dataclasses.replace(
                factor,
                target_key=-1,
                fixed_target_pose=jnp.asarray(self.frozen[factor.target_key]),
            )
        raise ValueError(
            f"factor references marginalized pose(s) {frozen_keys}; "
            f"increase window_size (currently {self.window_size})"
        )

    def _local_poses(self, keys: List[int]) -> jax.Array:
        return jnp.asarray(np.stack([self.estimates[k] for k in keys]))

    def _marginalize(self, marg_keys: List[int]):
        marg_set = set(marg_keys)
        touching = [f for f in self.factors if any(k in marg_set for k in f.keys if k >= 0)]
        remaining = [f for f in self.factors if not any(k in marg_set for k in f.keys if k >= 0)]
        involved = sorted({k for f in touching for k in f.keys if k >= 0})
        keep = [k for k in involved if k not in marg_set]

        if touching and keep:
            # Local subgraph over the involved keys ONLY — the dense system is
            # [6K, 6K] with K = |involved|, never max_poses-sized.
            mapping = {k: i for i, k in enumerate(involved)}
            local = tuple(remap_keys(f, mapping) for f in touching)
            leaves, treedef = jax.tree_util.tree_flatten(local)
            marg_slots = tuple(mapping[k] for k in marg_keys if k in mapping)
            keep_slots = tuple(mapping[k] for k in keep)
            cfg = (treedef, _avals_key(leaves), marg_slots, keep_slots)

            def builder():
                def run(leaves, poses_local):
                    factors = jax.tree_util.tree_unflatten(treedef, leaves)
                    sub = FactorGraph(list(factors), num_poses=len(involved))
                    A, b, _ = sub.linearize_full(poses_local)
                    H, bk = marginalize_system(A, b, list(marg_slots), list(keep_slots))
                    H = 0.5 * (H + H.T) + 1e-6 * jnp.eye(H.shape[0], dtype=H.dtype)
                    L = jnp.linalg.cholesky(H)
                    delta_star = jax.scipy.linalg.cho_solve((L, True), bk)
                    return L.T, delta_star

                return run

            fn, _ = self._programs.get(("marg", cfg), builder)
            poses_local = self._local_poses(involved)
            sqrt_info_t, delta_star = fn(tuple(leaves), poses_local)
            keep_arr = jnp.asarray([mapping[k] for k in keep], dtype=jnp.int32)
            remaining.append(
                MarginalPriorFactor(
                    lin_poses=poses_local[keep_arr],
                    sqrt_info_t=sqrt_info_t,
                    delta_star=delta_star,
                    pose_keys=tuple(keep),
                )
            )
        self.factors = remaining
        for k in marg_keys:
            self.frozen[k] = self.estimates[k]
            self.window.remove(k)

    def _optimize(self) -> Tuple[float, float, int, bool]:
        if not self.window or not self.factors:
            return 0.0, 0.0, 0, False
        mapping = {k: i for i, k in enumerate(self.window)}
        for f in self.factors:
            unknown = [k for k in f.keys if k >= 0 and k not in mapping]
            if unknown:
                raise ValueError(
                    f"factor {type(f).__name__} references key(s) {unknown} with no "
                    "value in the active window (add the value first)"
                )
        local = tuple(remap_keys(f, mapping) for f in self.factors)
        leaves, treedef = jax.tree_util.tree_flatten(local)
        params = self.lm_params
        num_poses = len(self.window)
        cfg = (treedef, _avals_key(leaves), num_poses, params)

        def builder():
            def run(leaves, poses):
                factors = jax.tree_util.tree_unflatten(treedef, leaves)
                g = FactorGraph(list(factors), num_poses=num_poses)
                return optimize_lm(g, poses, params)

            return run

        fn, compiled = self._programs.get(("opt", cfg), builder)
        poses0 = self._local_poses(self.window)
        res: LMResult = fn(tuple(leaves), poses0)
        new_poses = np.asarray(res.poses)
        if not np.all(np.isfinite(new_poses)):
            # fallback: retry once with heavy damping (reference:
            # IncrementalFixedLagSmootherExtWithFallback rebuild,
            # src/.../incremental_fixed_lag_smoother_ext_with_fallback.cpp:34-95)
            heavy = dataclasses.replace(params, lambda_initial=1e2)
            hcfg = (treedef, _avals_key(leaves), num_poses, heavy)

            def hbuilder():
                def run(leaves, poses):
                    factors = jax.tree_util.tree_unflatten(treedef, leaves)
                    g = FactorGraph(list(factors), num_poses=num_poses)
                    return optimize_lm(g, poses, heavy)

                return run

            hfn, hcompiled = self._programs.get(("opt", hcfg), hbuilder)
            res = hfn(tuple(leaves), poses0)
            new_poses = np.asarray(res.poses)
            compiled = compiled or hcompiled
            if not np.all(np.isfinite(new_poses)):
                # keep previous estimates (indeterminant-system guard)
                return float(res.status.error[0]), float(res.error), 0, compiled
        for k, i in mapping.items():
            self.estimates[k] = new_poses[i]
        return (
            float(res.status.error[0]),
            float(res.error),
            int(res.status.num_iterations),
            compiled,
        )


class ISAM2ExtDummy(ISAM2Ext):
    """No-op variant (reference: optimizers/isam2_ext_dummy.hpp — debugging
    with optimization disabled): update() records factors/values but never
    optimizes or marginalizes."""

    def update(self, new_factors: List = (), new_values: Optional[dict] = None) -> ISAM2ResultExt:
        t0 = time.perf_counter()
        if new_values:
            for key in sorted(new_values):
                self.estimates[key] = np.asarray(new_values[key], dtype=np.float32)
                if key not in self.window:
                    self.window.append(key)
                self.num_values = max(self.num_values, key + 1)
        self.factors.extend(new_factors)
        return ISAM2ResultExt(
            0.0, 0.0, len(self.factors), self.num_values, time.perf_counter() - t0, 0
        )
