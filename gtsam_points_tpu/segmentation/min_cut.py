"""Min-cut foreground/background segmentation.

Reference: min_cut (include/gtsam_points/segmentation/min_cut.hpp:17-62,
segmentation/impl/min_cut_impl.hpp): build a kNN graph with distance-based
edge weights, add source (foreground, within fg radius of the seed) and sink
(background, beyond bg radius) terminal edges, solve max-flow, return the
source-side cluster.

The graph build (kNN + weights) is batched on device; the max-flow solve runs
on host via scipy.sparse.csgraph.maximum_flow — the same division the
reference makes (its solve is Boost BGL on the host CPU). Segmentation is an
offline utility, not a hot kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gtsam_points_tpu.ops.hash_grid import build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame


@dataclasses.dataclass(frozen=True)
class MinCutParams:
    k: int = 10
    distance_sigma: float = 0.25  # edge weight scale
    foreground_radius: float = 0.5
    background_radius: float = 4.0
    foreground_weight: float = 100.0
    background_weight: float = 100.0
    grid_leaf: float = 0.5
    weight_scale: float = 1000.0  # float->int capacity scale for scipy maxflow


def min_cut(frame: Frame, seed_point, params: Optional[MinCutParams] = None) -> np.ndarray:
    """-> [N] bool foreground mask."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_flow

    p = params or MinCutParams()
    grid = build_hash_grid(frame.points, frame.mask, p.grid_leaf)
    nn_idx, nn_sq, nn_valid = knn_search(grid, frame.points, frame.mask, p.k)

    pts = np.asarray(frame.points)
    mask = np.asarray(frame.mask)
    idx = np.asarray(nn_idx)
    sq = np.asarray(nn_sq)
    valid = np.asarray(nn_valid)
    seed = np.asarray(seed_point, dtype=np.float32)

    n = len(pts)
    src_node, sink_node = n, n + 1
    rows, cols, caps = [], [], []

    # smoothness edges: w = exp(-d^2 / sigma^2)
    w = np.exp(-sq / (p.distance_sigma**2)) * valid
    ii = np.repeat(np.arange(n), p.k)
    jj = idx.reshape(-1)
    ww = w.reshape(-1)
    keep = (ww > 1e-4) & (jj >= 0) & (ii != jj)
    rows.append(ii[keep])
    cols.append(jj[keep])
    caps.append(ww[keep])

    # terminal edges from seed distance
    d_seed = np.linalg.norm(pts - seed, axis=1)
    fg = mask & (d_seed <= p.foreground_radius)
    bg = mask & (d_seed >= p.background_radius)
    fg_idx = np.nonzero(fg)[0]
    bg_idx = np.nonzero(bg)[0]
    rows.append(np.full(len(fg_idx), src_node))
    cols.append(fg_idx)
    caps.append(np.full(len(fg_idx), p.foreground_weight))
    rows.append(bg_idx)
    cols.append(np.full(len(bg_idx), sink_node))
    caps.append(np.full(len(bg_idx), p.background_weight))

    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    caps = np.concatenate(caps)
    cap_int = np.maximum((caps * p.weight_scale).astype(np.int64), 1)
    g = csr_matrix((cap_int, (rows, cols)), shape=(n + 2, n + 2))
    # symmetrize (undirected smoothness)
    g = g.maximum(g.T.tocsr())
    res = maximum_flow(g, src_node, sink_node)
    # source side of the residual graph = foreground
    residual = g - res.flow.maximum(0)
    from scipy.sparse.csgraph import breadth_first_order

    reach, _ = breadth_first_order(residual > 0, src_node, directed=True, return_predecessors=True)
    out = np.zeros(n, dtype=bool)
    reach = reach[(reach >= 0) & (reach < n)]
    out[reach] = True
    return out & mask
