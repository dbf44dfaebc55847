"""Memory accounting helpers (reference: memory_usage() methods on clouds and
factors, e.g. include/gtsam_points/factors/integrated_icp_factor.hpp:82-87)."""

from __future__ import annotations

import jax


def nbytes(tree) -> int:
    """Total device bytes of a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(x.size * x.dtype.itemsize for x in leaves if hasattr(x, "dtype"))
