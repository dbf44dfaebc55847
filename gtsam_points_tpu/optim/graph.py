"""Factor graph container + fused linearize-all.

The reference's optimizers dispatch `linearize()` per factor object and gather
gtsam::HessianFactors into a GaussianFactorGraph (reference:
src/gtsam_points/factors/integrated_matching_cost_factor.cpp:37-55,
optimizers/linearization_hook.hpp). Here the whole graph linearizes inside ONE
jitted program: the Python loop below unrolls at trace time into a single
fused XLA computation — the TPU analogue of NonlinearFactorSetGPU's batched
device linearization (src/gtsam_points/cuda/nonlinear_factor_set_gpu.cpp:60-190),
with no per-factor host round-trips.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


class FactorGraph:
    """An ordered list of factor pytrees over a pose array [P, 4, 4]."""

    def __init__(self, factors: Sequence = (), num_poses: int = 0):
        self.factors: List = list(factors)
        self.num_poses = num_poses

    def add(self, factor) -> "FactorGraph":
        self.factors.append(factor)
        for k in factor.keys:
            self.num_poses = max(self.num_poses, k + 1)
        return self

    def __len__(self):
        return len(self.factors)

    def linearize_full(self, poses: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """-> (A [6P, 6P], b [6P], error ()). Dense block assembly."""
        A, b, err, _ = self.linearize_frozen(poses)
        return A, b, err

    def correspondences(self, poses: jax.Array):
        """Per-factor correspondence caches at `poses` (None for factors
        without a cacheable search). The LM optimizer re-runs this only when
        the pose moved beyond the correspondence-update tolerance — the
        reference's set_correspondence_update_tolerance / inlier-recompute
        gate (impl/integrated_icp_factor_impl.hpp:128-143,
        cuda/kernels/integrated_vgicp_derivatives.cuh:30-34)."""
        return tuple(
            f.correspondences(poses)
            if hasattr(f, "correspondences") and hasattr(f, "linearize_corr")
            else None
            for f in self.factors
        )

    def linearize_frozen(self, poses: jax.Array, corr=None):
        """-> (A, b, error, frozen_error_fn). frozen_error_fn(poses') evaluates
        the graph error with every matching factor's correspondences/weights
        frozen at THIS linearization point (majorize-minimize surrogate);
        smooth factors evaluate exactly. `corr` (from correspondences())
        short-circuits the per-factor search for factors that support it."""
        p = self.num_poses
        A = jnp.zeros((p, p, 6, 6), dtype=jnp.float32)
        b = jnp.zeros((p, 6), dtype=jnp.float32)
        err = jnp.float32(0.0)
        err_fns = []
        for fi, f in enumerate(self.factors):
            keys = f.keys
            # Factors with a separable probe always linearize analytically on
            # the correspondence payload (Pallas-fused on TPU) — when no cache
            # is supplied the probe runs fresh at this linearization point.
            fcorr = None
            if hasattr(f, "correspondences") and hasattr(f, "linearize_corr"):
                fcorr = corr[fi] if corr is not None and corr[fi] is not None else f.correspondences(poses)
            if fcorr is not None:
                lin, efn = f.linearize_corr(poses, fcorr)
                err_fns.append(efn)
                t, s = keys
                if t >= 0:
                    A = A.at[t, t].add(lin.H_tt)
                    A = A.at[t, s].add(lin.H_ts)
                    A = A.at[s, t].add(lin.H_ts.T)
                    b = b.at[t].add(lin.b_t)
                A = A.at[s, s].add(lin.H_ss)
                b = b.at[s].add(lin.b_s)
                err = err + lin.error
                continue
            if hasattr(f, "add_to_system"):
                A, b, errf, efn = f.add_to_system(A, b, poses)
                err = err + errf
                err_fns.append(efn)
                continue
            if hasattr(f, "multi_linearize"):
                Hm, bm, errm = f.multi_linearize(poses)
                err_fns.append(f.error)
                k = len(keys)
                Hm = Hm.reshape(k, 6, k, 6)
                bm = bm.reshape(k, 6)
                for i, ki in enumerate(keys):
                    b = b.at[ki].add(bm[i])
                    for j, kj in enumerate(keys):
                        A = A.at[ki, kj].add(Hm[i, :, j, :])
                err = err + errm
                continue
            if hasattr(f, "linearize_with_error_fn"):
                lin, efn = f.linearize_with_error_fn(poses)
                err_fns.append(efn)
            else:
                lin = f.linearize(poses)
                err_fns.append(f.error)
            if len(keys) == 1:
                (k,) = keys
                A = A.at[k, k].add(lin.H_tt)
                b = b.at[k].add(lin.b_t)
            else:
                t, s = keys
                if t >= 0:
                    A = A.at[t, t].add(lin.H_tt)
                    A = A.at[t, s].add(lin.H_ts)
                    A = A.at[s, t].add(lin.H_ts.T)
                A = A.at[s, s].add(lin.H_ss)
                if t >= 0:
                    b = b.at[t].add(lin.b_t)
                b = b.at[s].add(lin.b_s)
            err = err + lin.error
        A_full = A.transpose(0, 2, 1, 3).reshape(6 * p, 6 * p)

        def frozen_error(new_poses):
            total = jnp.float32(0.0)
            for efn in err_fns:
                total = total + efn(new_poses)
            return total

        return A_full, b.reshape(6 * p), err, frozen_error

    def error(self, poses: jax.Array) -> jax.Array:
        err = jnp.float32(0.0)
        for f in self.factors:
            err = err + f.error(poses)
        return err


def retract(poses: jax.Array, delta: jax.Array) -> jax.Array:
    """Right-retraction of all poses: T_i <- T_i · Exp(delta_i)."""
    from gtsam_points_tpu.utils import se3

    p = poses.shape[0]
    return poses @ se3.se3_exp(delta.reshape(p, 6))
