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
from gtsam_points_tpu.utils import se3
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
    num_loop_closures: int = 0  # frozen-touching factors realized this update

    def to_string(self) -> str:
        return (
            f"error {self.error_before:.3f} -> {self.error_after:.3f} | "
            f"factors {self.num_factors} | values {self.num_values} | "
            f"window {self.num_relinearized} | marg {self.num_marginalized} | "
            f"iters {self.num_iterations} | "
            f"{f'loops {self.num_loop_closures} | ' if self.num_loop_closures else ''}"
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
    returns every pose (frozen ones updated by loop-closure relaxes).

    LATE LOOP CLOSURES (reference analogue: ISAM2Ext fluid relinearization +
    wildfire partial deltas, src/gtsam_points/optimizers/isam2_ext.cpp:
    425-520, :754-860 — a loop factor arriving late still corrects old
    poses). The TPU-idiomatic equivalent here: every binary factor retired
    by marginalization leaves behind a pose-graph EDGE (relative measurement
    at the marginalization-time estimates, information from its Hessian
    diagonal), so frozen history keeps a block-sparse skeleton. When a new
    factor touches a frozen pose, it is realized as a loop EDGE (matching
    costs via a local pair registration), the WHOLE trajectory — frozen
    chain + rigid active window — is relaxed with the O(P+E) pose-graph LM
    (optim/sparse.py), every estimate (frozen included) is updated, and the
    window's marginal priors are re-anchored at the relaxed configuration.
    The loop factor additionally stays in the active graph in unary mode
    when its target is frozen (the round-2 behavior), so the window keeps
    feeling it between relaxes. Set enable_loop_closure=False to restore
    the round-2 raise-on-frozen behavior.
    """

    def __init__(
        self,
        window_size: int = 8,
        lm_params: Optional[LMParams] = None,
        max_poses: Optional[int] = None,
        enable_loop_closure: bool = True,
        full_edge_info: bool = True,
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
        self.enable_loop_closure = enable_loop_closure
        # full_edge_info=True retains each retired factor's FULL [6,6] H_ss
        # (rot-trans coupling) on its skeleton edge, matching the reference's
        # dense Hessian retention (integrated_matching_cost_factor.cpp:37-55);
        # False keeps the round-3 diagonal approximation (stored as diag
        # matrices — the skeleton format is [6,6] either way).
        self.full_edge_info = full_edge_info
        # pose-graph skeleton of frozen history: (t, s, measured 4x4, info [6,6])
        self.history_edges: List[Tuple[int, int, np.ndarray, np.ndarray]] = []
        # priors retired by marginalization: (key, T 4x4, w [6])
        self.history_priors: List[Tuple[int, np.ndarray, np.ndarray]] = []
        self.loop_edges: List[Tuple[int, int, np.ndarray, np.ndarray]] = []
        # unary-baked loop factors with their ORIGINAL frozen target key, so a
        # later relax can refresh their fixed_target_pose (baking erases the
        # key from the factor itself)
        self._baked_loops: List[Tuple[object, int]] = []

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

        loop_factors = []
        for f in new_factors:
            frozen_keys = [k for k in f.keys if k >= 0 and k in self.frozen]
            if frozen_keys and self.enable_loop_closure:
                loop_factors.append(f)
            else:
                self.factors.append(self._adopt(f))
        if loop_factors:
            for f in loop_factors:
                if hasattr(f, "prior") and hasattr(f, "key"):
                    # a PriorFactor on a frozen key needs no edge realization:
                    # it joins the history skeleton directly and the relax
                    # pulls the trajectory toward it (advisor finding, r3)
                    self.history_priors.append(
                        (f.key, np.asarray(f.prior, np.float32),
                         np.asarray(f.weights, np.float32))
                    )
                else:
                    self.loop_edges.append(self._realize_edge(f))
            self._relax()
            # keep the loop constraint in the active graph where unary baking
            # supports it (frozen TARGET), at the RELAXED frozen estimate
            for f in loop_factors:
                baked = self._try_bake(f)
                if baked is not None:
                    self.factors.append(baked)

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
            num_loop_closures=len(loop_factors),
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

    # -- loop closures -------------------------------------------------------

    def _edge_info(self, H_ss: np.ndarray) -> np.ndarray:
        """Retired-factor information from its source-block Hessian: the full
        [6,6] (PD-floored by eigenvalue clip) when full_edge_info, else the
        diagonal approximation as a diag matrix."""
        H = np.asarray(H_ss, np.float64)
        if not self.full_edge_info:
            return np.diag(np.clip(np.diagonal(H), 1e-3, None)).astype(np.float32)
        H = 0.5 * (H + H.T)
        w, V = np.linalg.eigh(H)
        return (V @ np.diag(np.clip(w, 1e-3, None)) @ V.T).astype(np.float32)

    def _realize_edge(self, factor) -> Tuple[int, int, np.ndarray, np.ndarray]:
        """Turn a factor touching frozen pose(s) into a pose-graph edge
        (t, s, measured 4x4, info [6,6]).

        BetweenFactor: direct (diag(weights) information). Matching-cost
        factor: LOCAL PAIR REGISTRATION — fix the target at its current
        estimate, optimize the source pose under the factor alone (one
        cached jitted LM program), measured = the registered relative pose,
        info = the factor's source-block Hessian at the optimum (full [6,6]
        retaining rot-trans coupling when full_edge_info, its diagonal
        otherwise — see _edge_info)."""
        for k in (getattr(factor, "target_key", None), getattr(factor, "source_key", None)):
            if k is not None and k >= 0 and k not in self.estimates:
                raise ValueError(
                    f"loop-closure factor {type(factor).__name__} references key {k}, "
                    f"which has no estimate in this ISAM2 session (known keys: "
                    f"{sorted(self.estimates)[:8]}{'...' if len(self.estimates) > 8 else ''})"
                )
        if hasattr(factor, "measured"):  # BetweenFactor
            return (
                factor.target_key,
                factor.source_key,
                np.asarray(factor.measured, np.float32),
                np.diag(np.asarray(factor.weights, np.float32)),
            )
        if not (hasattr(factor, "target_key") and hasattr(factor, "fixed_target_pose")):
            raise ValueError(
                f"cannot realize {type(factor).__name__} touching frozen pose(s) "
                "as a loop-closure edge (supported: BetweenFactor and matching-cost "
                "factors with a fixable target; PriorFactors on frozen keys are "
                "handled by add-as-history-prior upstream)"
            )
        t, s = factor.target_key, factor.source_key
        T_t = jnp.asarray(self.estimates[t])
        T_s0 = jnp.asarray(self.estimates[s])
        unary = dataclasses.replace(
            factor, target_key=-1, source_key=0, fixed_target_pose=T_t
        )
        leaves, treedef = jax.tree_util.tree_flatten(unary)
        cfg = (treedef, _avals_key(leaves))

        def builder():
            def run(leaves, T_s0):
                f = jax.tree_util.tree_unflatten(treedef, leaves)
                g = FactorGraph([f], num_poses=1)
                res = optimize_lm(g, T_s0[None], LMParams(max_iterations=15))
                lin = f.linearize(res.poses)
                return res.poses[0], lin.H_ss

            return run

        fn, _ = self._programs.get(("edge", cfg), builder)
        T_s_opt, H_ss = jax.device_get(fn(tuple(leaves), T_s0))  # one fetch
        measured = (np.linalg.inv(self.estimates[t]) @ T_s_opt).astype(np.float32)
        return (t, s, measured, self._edge_info(H_ss))

    def _realize_edge_at_estimates(self, factor) -> Tuple[int, int, np.ndarray, np.ndarray]:
        """History edge for a binary factor being retired by marginalization:
        the window was just optimized, so the current estimates ARE the
        factor's optimum — measured directly from estimates, info = the
        factor's source-block Hessian there (no re-registration)."""
        if hasattr(factor, "measured"):  # BetweenFactor
            return (
                factor.target_key,
                factor.source_key,
                np.asarray(factor.measured, np.float32),
                np.diag(np.asarray(factor.weights, np.float32)),
            )
        t, s = factor.target_key, factor.source_key
        local = remap_keys(factor, {t: 0, s: 1})
        leaves, treedef = jax.tree_util.tree_flatten(local)
        cfg = (treedef, _avals_key(leaves))

        def builder():
            def run(leaves, poses2):
                f = jax.tree_util.tree_unflatten(treedef, leaves)
                return f.linearize(poses2).H_ss

            return run

        fn, _ = self._programs.get(("edgeinfo", cfg), builder)
        poses2 = jnp.asarray(np.stack([self.estimates[t], self.estimates[s]]))
        info = self._edge_info(np.asarray(fn(tuple(leaves), poses2)))
        measured = (np.linalg.inv(self.estimates[t]) @ self.estimates[s]).astype(np.float32)
        return (t, s, measured, info)

    def _try_bake(self, factor):
        """Unary-bake a loop factor into the active graph where supported
        (matching factor with frozen TARGET and active source), at the
        relaxed frozen estimate; None otherwise (the pose-graph edge already
        carries the constraint)."""
        frozen_keys = [k for k in factor.keys if k >= 0 and k in self.frozen]
        if (
            hasattr(factor, "target_key")
            and hasattr(factor, "fixed_target_pose")
            and frozen_keys == [factor.target_key]
            and factor.source_key in self.window
        ):
            baked = dataclasses.replace(
                factor,
                target_key=-1,
                fixed_target_pose=jnp.asarray(self.frozen[factor.target_key]),
            )
            self._baked_loops.append((baked, factor.target_key))
            return baked
        return None

    def _relax(self):
        """Global trajectory relax after a loop closure: history skeleton +
        loop edges + rigid active-window chain, optimized with the O(P+E)
        block-sparse pose-graph LM (optim/sparse.py). Every estimate (frozen
        included) is updated; marginal priors are re-anchored at the relaxed
        configuration with their pending delta_star TRANSPORTED to the new
        lin point to first order (delta*' = Log(T_pre^-1 lin Exp(delta*)),
        see _reanchor) — the prior keeps both the relative structure it
        constrains and the not-yet-retracted correction it carried."""
        from gtsam_points_tpu.optim.sparse import PoseGraphEdges, optimize_pose_graph

        keys = sorted(self.estimates)
        if len(keys) < 2:
            return
        idx = {k: i for i, k in enumerate(keys)}

        edges = list(self.history_edges) + list(self.loop_edges)
        for a, b in zip(self.window, self.window[1:]):
            m = np.linalg.inv(self.estimates[a]) @ self.estimates[b]
            edges.append((a, b, m.astype(np.float32), np.diag(np.full(6, 1e6, np.float32))))

        priors = list(self.history_priors)
        for f in self.factors:
            if hasattr(f, "prior") and hasattr(f, "key"):
                priors.append(
                    (f.key, np.asarray(f.prior, np.float32), np.asarray(f.weights, np.float32))
                )
        if not priors:  # gauge fix
            priors.append((keys[0], self.estimates[keys[0]], np.full(6, 1e6, np.float32)))

        def pad(n, mult=8):
            # GEOMETRIC buckets (round 5): a 1000-pose session closes loops at
            # many distinct sizes; multiple-of-8 padding compiled a fresh
            # O(P+E) relax program per closure, so compile count grew with
            # session length. Power-of-two buckets reuse one program per
            # doubling (padded poses carry zero-info edges / zero-weight
            # priors and a zero gradient, so LM leaves them at identity).
            return max(mult, 1 << (n - 1).bit_length())

        E, Q, P = pad(len(edges)), pad(len(priors)), pad(len(keys))
        eye = np.eye(4, dtype=np.float32)
        measured = np.stack([e[2] for e in edges] + [eye] * (E - len(edges)))
        e_info = np.stack([e[3] for e in edges] + [np.zeros((6, 6), np.float32)] * (E - len(edges)))
        t_idx = np.asarray([idx[e[0]] for e in edges] + [0] * (E - len(edges)), np.int32)
        s_idx = np.asarray([idx[e[1]] for e in edges] + [0] * (E - len(edges)), np.int32)
        prior_T = np.stack([p[1] for p in priors] + [eye] * (Q - len(priors)))
        prior_w = np.stack([p[2] for p in priors] + [np.zeros(6, np.float32)] * (Q - len(priors)))
        prior_idx = np.asarray([idx[p[0]] for p in priors] + [0] * (Q - len(priors)), np.int32)

        def builder():
            def run(pg, poses0):
                return optimize_pose_graph(pg, poses0, max_iterations=50)

            return run

        fn, _ = self._programs.get(("relax", P, E, Q), builder)
        pg = PoseGraphEdges(
            measured=jnp.asarray(measured),
            weights=jnp.asarray(np.diagonal(e_info, axis1=1, axis2=2).copy()),
            t_idx=jnp.asarray(t_idx),
            s_idx=jnp.asarray(s_idx),
            prior_T=jnp.asarray(prior_T),
            prior_w=jnp.asarray(prior_w),
            prior_idx=jnp.asarray(prior_idx),
            info=jnp.asarray(e_info),
        )
        poses0 = jnp.asarray(
            np.stack([self.estimates[k] for k in keys] + [eye] * (P - len(keys)))
        )
        res = fn(pg, poses0)
        new_poses = np.asarray(res.poses)
        if not np.all(np.isfinite(new_poses)):
            return  # keep previous estimates (indeterminant relax guard)
        pre_estimates = {k: self.estimates[k].copy() for k in keys}
        for k in keys:
            self.estimates[k] = new_poses[idx[k]]
        for k in self.frozen:
            self.frozen[k] = self.estimates[k]
        self.factors = [
            self._reanchor(f, pre_estimates) if isinstance(f, MarginalPriorFactor) else f
            for f in self.factors
        ]
        # refresh previously-baked loop factors to the RELAXED frozen target
        # (their fixed_target_pose would otherwise keep pulling the window
        # toward the pre-relax configuration — review finding, round 3)
        still_baked = []
        for obj, key in self._baked_loops:
            for i, f in enumerate(self.factors):
                if f is obj:
                    new_f = dataclasses.replace(
                        obj, fixed_target_pose=jnp.asarray(self.frozen[key])
                    )
                    self.factors[i] = new_f
                    still_baked.append((new_f, key))
                    break
            # not found -> the factor was absorbed by marginalization; drop it
        self._baked_loops = still_baked

    def _reanchor(self, f: MarginalPriorFactor, pre_estimates) -> MarginalPriorFactor:
        """Re-anchor a marginal prior at the RELAXED estimates, transporting
        its pending offset instead of discarding it (advisor finding, r3).

        The prior's implied optimum in the old frame is
        T*_k = lin_k · Exp(delta*_k); a gauge-consistent relax applies a
        left correction C_k to every pose, moving the optimum to C_k · T*_k.
        With the new linearization point T'_k = C_k · T_pre_k, the new
        offset is delta*'_k = Log(T'⁻¹ C T*) = Log(T_pre_k⁻¹ lin_k
        Exp(delta*_k)) — the prior's unconverged residual at the PRE-relax
        estimate, independent of C (first-order transport; exact when the
        window had converged onto the prior, where it reduces to zero as
        before)."""
        K = len(f.pose_keys)
        lin_new = np.stack([self.estimates[k] for k in f.pose_keys])
        old_lin = np.asarray(f.lin_poses)
        dstar = np.asarray(f.delta_star).reshape(K, 6)
        dnew = np.zeros_like(dstar)
        for i, k in enumerate(f.pose_keys):
            T_opt = old_lin[i] @ np.asarray(se3.se3_exp(jnp.asarray(dstar[i])))
            pre = pre_estimates.get(k, self.estimates[k])
            dnew[i] = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(pre) @ T_opt)))
        return dataclasses.replace(
            f,
            lin_poses=jnp.asarray(lin_new),
            delta_star=jnp.asarray(dnew.reshape(-1)),
        )

    def _marginalize(self, marg_keys: List[int]):
        marg_set = set(marg_keys)
        touching = [f for f in self.factors if any(k in marg_set for k in f.keys if k >= 0)]
        remaining = [f for f in self.factors if not any(k in marg_set for k in f.keys if k >= 0)]
        involved = sorted({k for f in touching for k in f.keys if k >= 0})
        keep = [k for k in involved if k not in marg_set]

        if self.enable_loop_closure:
            # retired factors leave a pose-graph skeleton behind so a LATE
            # loop closure can still relax frozen history (see class doc)
            for f in touching:
                ks = [k for k in f.keys if k >= 0]
                if hasattr(f, "prior") and hasattr(f, "key"):
                    self.history_priors.append(
                        (f.key, np.asarray(f.prior, np.float32), np.asarray(f.weights, np.float32))
                    )
                elif len(ks) == 2 and hasattr(f, "target_key") and not isinstance(f, MarginalPriorFactor):
                    self.history_edges.append(self._realize_edge_at_estimates(f))

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
        # ONE device->host fetch for everything this update reads (each
        # np.asarray/float() is a separate blocking round trip — 4 syncs cost
        # ~3 extra tunnel latencies per update)
        new_poses, err0, err1, n_iter = jax.device_get(
            (res.poses, res.status.error[0], res.error, res.status.num_iterations)
        )
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
            new_poses, err0, err1, n_iter = jax.device_get(
                (res.poses, res.status.error[0], res.error, res.status.num_iterations)
            )
            compiled = compiled or hcompiled
            if not np.all(np.isfinite(new_poses)):
                # keep previous estimates (indeterminant-system guard)
                return float(err0), float(err1), 0, compiled
        for k, i in mapping.items():
            self.estimates[k] = new_poses[i]
        return (float(err0), float(err1), int(n_iter), compiled)


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
