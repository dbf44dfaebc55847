"""Shared machinery for binary/unary matching-cost factors.

Mirrors the base-class contract of IntegratedMatchingCostFactor —
update_correspondences(delta) + evaluate(delta, H..., b...) with binary
(two pose keys) or unary (fixed target pose) modes and delta = T_t⁻¹·T_s
(reference: include/gtsam_points/factors/integrated_matching_cost_factor.hpp:11-83)
— but as pure functions over pose arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.linearized import Linearized, evaluate_error, linearize_residuals
from gtsam_points_tpu.utils import se3


def register_factor(cls, data_fields, meta_fields):
    """Register a frozen dataclass factor as a pytree with static meta fields."""
    return jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)


def remap_keys(factor, mapping: dict):
    """Copy of `factor` with every pose key k >= 0 replaced by mapping[k]
    (keys absent from the mapping, and the unary -1 sentinel, are unchanged).

    Handles every key convention in the factor zoo: `key`, `target_key` /
    `source_key`, and `pose_keys` tuples. Used by the incremental optimizers to
    express a sliding window in stable local slot indices so the jitted window
    program's structure (factor keys are static metadata) does not change
    between updates."""

    def m(k):
        return mapping.get(k, k) if k >= 0 else k

    kwargs = {}
    for name in ("key", "target_key", "source_key"):
        if hasattr(factor, name):
            kwargs[name] = m(getattr(factor, name))
    if hasattr(factor, "pose_keys"):
        kwargs["pose_keys"] = tuple(m(k) for k in factor.pose_keys)
    if not kwargs:
        raise TypeError(f"cannot remap keys of {type(factor).__name__}")
    return dataclasses.replace(factor, **kwargs)


def factor_poses(factor, poses: jax.Array):
    """Resolve (T_target, T_source) for a factor. target_key == -1 -> unary
    mode with the stored fixed target pose (reference:
    integrated_matching_cost_factor.cpp:11-19)."""
    if factor.target_key < 0:
        T_t = factor.fixed_target_pose
    else:
        T_t = poses[factor.target_key]
    T_s = poses[factor.source_key]
    return T_t, T_s


class MatchingFactorMixin:
    """Factors implement `residual_closure(T_t, T_s) -> residual_fn` where
    residual_fn has frozen correspondences/weights computed at (T_t, T_s)."""

    def linearize(self, poses: jax.Array) -> Linearized:
        T_t, T_s = factor_poses(self, poses)
        return linearize_residuals(self.residual_closure(T_t, T_s), T_t, T_s)

    def linearize_with_error_fn(self, poses: jax.Array):
        """-> (Linearized, frozen_error_fn). The error fn evaluates candidate
        poses on the SAME correspondences/weights frozen at this linearization
        point — the majorize-minimize surrogate the LM accept gate uses, so the
        model and the gated objective are consistent even when the inlier set
        churns between outer iterations."""
        T_t, T_s = factor_poses(self, poses)
        closure = self.residual_closure(T_t, T_s)
        lin = linearize_residuals(closure, T_t, T_s)

        def err_fn(new_poses):
            nT_t, nT_s = factor_poses(self, new_poses)
            return evaluate_error(closure, nT_t, nT_s)

        return lin, err_fn

    def error(self, poses: jax.Array) -> jax.Array:
        T_t, T_s = factor_poses(self, poses)
        return evaluate_error(self.residual_closure(T_t, T_s), T_t, T_s)

    @property
    def keys(self):
        return (self.target_key, self.source_key)
