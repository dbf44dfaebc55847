"""PFH / FPFH feature histograms (PCL-compatible binning).

Reference: estimate_pfh / estimate_fpfh
(include/gtsam_points/features/fpfh_estimation.hpp:55-149,
src/gtsam_points/features/fpfh_estimation.cpp:95-281). Pair features
(alpha, phi, theta) from Darboux frames; SPFH = per-point histogram over k
neighbors (3 x 11 bins); FPFH = SPFH + distance-weighted blend of neighbor
SPFHs. TPU design: histograms are one-hot scatter-adds over the [N, k]
neighbor table — three segment-sums instead of per-point loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gtsam_points_tpu.ops.hash_grid import HashGrid, build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame

FPFH_BINS = 11
FPFH_DIM = 3 * FPFH_BINS  # 33
PFH_DIM = 125


def compute_pair_features(p1, n1, p2, n2):
    """Darboux-frame pair features (alpha, phi, theta, d) — PCL convention
    (reference: compute_pair_features, fpfh_estimation.cpp)."""
    dvec = p2 - p1
    d = jnp.linalg.norm(dvec, axis=-1)
    d_safe = jnp.maximum(d, 1e-12)
    du = dvec / d_safe[..., None]
    # PCL swaps (p1,n1)<->(p2,n2) so that angle(n1, d) <= angle(n2, -d)
    cos1 = jnp.sum(n1 * du, axis=-1)
    cos2 = jnp.sum(n2 * -du, axis=-1)
    swap = jnp.abs(cos2) > jnp.abs(cos1)
    a1 = jnp.where(swap[..., None], n2, n1)
    a2 = jnp.where(swap[..., None], n1, n2)
    du = jnp.where(swap[..., None], -du, du)
    u = a1
    v = jnp.cross(du, u)
    v_norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(v_norm, 1e-12)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * a2, axis=-1)
    phi = jnp.sum(u * du, axis=-1)
    theta = jnp.arctan2(jnp.sum(w * a2, axis=-1), jnp.sum(u * a2, axis=-1))
    return alpha, phi, theta, d


def _bin_index(x, lo, hi):
    b = jnp.floor((x - lo) / (hi - lo) * FPFH_BINS).astype(jnp.int32)
    return jnp.clip(b, 0, FPFH_BINS - 1)


def _spfh(frame: Frame, nn_idx, nn_valid):
    """[N, 3*11] SPFH histograms (percent-normalized per sub-histogram)."""
    p1 = frame.points[:, None, :]
    n1 = frame.normals[:, None, :]
    idx = jnp.maximum(nn_idx, 0)
    p2 = frame.points[idx]
    n2 = frame.normals[idx]
    alpha, phi, theta, _ = compute_pair_features(p1, n1, p2, n2)
    w = nn_valid.astype(jnp.float32)
    b_a = _bin_index(alpha, -1.0, 1.0)
    b_p = _bin_index(phi, -1.0, 1.0)
    b_t = _bin_index(theta, -jnp.pi, jnp.pi)

    def hist(bins):
        oh = jax.nn.one_hot(bins, FPFH_BINS, dtype=jnp.float32) * w[..., None]
        h = jnp.sum(oh, axis=1)
        return h / jnp.maximum(jnp.sum(h, axis=-1, keepdims=True), 1e-12) * 100.0

    return jnp.concatenate([hist(b_a), hist(b_p), hist(b_t)], axis=-1)


def estimate_fpfh(
    frame: Frame,
    k: int = 30,
    grid: HashGrid | None = None,
    grid_leaf: float = 2.5,
    num_neighbor_cells: int = 27,
    max_points_per_cell: int = 32,
    max_search_radius: float = 5.0,
) -> jax.Array:
    """[N, 33] FPFH descriptors (invalid slots zero).

    Defaults approximate the reference's radius-5.0 search
    (FPFHEstimationParams::search_radius, src/test/test_global_registration.cpp)
    with a k-bounded grid neighborhood — descriptors need tens of neighbors to
    be discriminative."""
    if frame.normals is None:
        raise ValueError("FPFH requires normals")
    if grid is None:
        grid = build_hash_grid(frame.points, frame.mask, grid_leaf)
    nn_idx, nn_sq, nn_valid = knn_search(
        grid,
        frame.points,
        frame.mask,
        k + 1,
        num_neighbor_cells=num_neighbor_cells,
        max_points_per_cell=max_points_per_cell,
        max_sq_dist=max_search_radius**2,
    )
    # drop self-match (first column)
    nn_idx, nn_sq, nn_valid = nn_idx[:, 1:], nn_sq[:, 1:], nn_valid[:, 1:]
    spfh = _spfh(frame, nn_idx, nn_valid)
    # FPFH_i = SPFH_i + (1/k) sum_j (1/w_ij) SPFH_j, w = sq dist (PCL uses sq dist)
    idx = jnp.maximum(nn_idx, 0)
    wgt = jnp.where(nn_valid, 1.0 / jnp.maximum(nn_sq, 1e-6), 0.0)
    nb_spfh = spfh[idx]  # [N, k, 33]
    cnt = jnp.maximum(jnp.sum(nn_valid, axis=-1), 1)
    blended = jnp.einsum("nk,nkd->nd", wgt, nb_spfh) / cnt[:, None]
    fpfh = spfh + blended
    # per-sub-histogram percent normalization (PCL-compatible)
    fp = fpfh.reshape(-1, 3, FPFH_BINS)
    fp = fp / jnp.maximum(jnp.sum(fp, axis=-1, keepdims=True), 1e-12) * 100.0
    out = fp.reshape(-1, FPFH_DIM)
    return jnp.where(frame.mask[:, None], out, 0.0)


def estimate_pfh(
    frame: Frame,
    k: int = 10,
    grid: HashGrid | None = None,
    grid_leaf: float = 2.0,
    bins: int = 5,
) -> jax.Array:
    """[N, 125] PFH: joint 5^3 histogram over all neighbor pairs within the
    k-neighborhood (reference: estimate_pfh, PFH_DIM=125)."""
    if frame.normals is None:
        raise ValueError("PFH requires normals")
    if grid is None:
        grid = build_hash_grid(frame.points, frame.mask, grid_leaf)
    nn_idx, _, nn_valid = knn_search(grid, frame.points, frame.mask, k)
    idx = jnp.maximum(nn_idx, 0)  # [N, k] includes self
    p = frame.points[idx]  # [N, k, 3]
    n = frame.normals[idx]
    # all ordered pairs (i < j) within the neighborhood
    ii, jj = jnp.triu_indices(k, 1)
    p1, n1 = p[:, ii], n[:, ii]
    p2, n2 = p[:, jj], n[:, jj]
    valid = nn_valid[:, ii] & nn_valid[:, jj]
    alpha, phi, theta, _ = compute_pair_features(p1, n1, p2, n2)

    def bidx(x, lo, hi):
        return jnp.clip(jnp.floor((x - lo) / (hi - lo) * bins).astype(jnp.int32), 0, bins - 1)

    joint = bidx(alpha, -1.0, 1.0) * bins * bins + bidx(phi, -1.0, 1.0) * bins + bidx(theta, -jnp.pi, jnp.pi)
    oh = jax.nn.one_hot(joint, bins**3, dtype=jnp.float32) * valid.astype(jnp.float32)[..., None]
    h = jnp.sum(oh, axis=1)
    h = h / jnp.maximum(jnp.sum(h, axis=-1, keepdims=True), 1e-12) * 100.0
    return jnp.where(frame.mask[:, None], h, 0.0)


def feature_knn(target_feats: jax.Array, target_mask: jax.Array, source_feats: jax.Array, source_mask: jax.Array, k: int = 1, block: int = 1024):
    """Brute-force NN in 33-D feature space — a dense [Q, N] distance matmul
    that rides the MXU (replaces KdTreeX<33>, reference: ann/kdtreex.hpp:27)."""
    from gtsam_points_tpu.ops.hash_grid import brute_force_knn  # same pattern, any dim

    tf = jnp.where(target_mask[:, None], target_feats, jnp.inf)
    q = source_feats.shape[0]
    pad_q = (-q) % block
    sf = jnp.pad(source_feats, ((0, pad_q), (0, 0)))
    sm = jnp.pad(source_mask, (0, pad_q))
    nb = (q + pad_q) // block
    t_sq = jnp.sum(jnp.where(target_mask[:, None], target_feats, 0.0) ** 2, axis=-1)
    t_clean = jnp.where(target_mask[:, None], target_feats, 0.0)

    def body(carry, inp):
        qb, mb = inp
        d = jnp.sum(qb * qb, axis=-1, keepdims=True) + t_sq[None, :] - 2.0 * qb @ t_clean.T
        d = jnp.where(target_mask[None, :], d, jnp.inf)
        neg, idx = jax.lax.top_k(-d, k)
        sq = jnp.maximum(-neg, 0.0)
        valid = jnp.isfinite(sq) & mb[:, None]
        return carry, (jnp.where(valid, idx, -1), sq, valid)

    _, (idx, sq, valid) = jax.lax.scan(body, None, (sf.reshape(nb, block, -1), sm.reshape(nb, block)))
    return idx.reshape(-1, k)[:q], sq.reshape(-1, k)[:q], valid.reshape(-1, k)[:q]
