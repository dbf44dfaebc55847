"""Photometric (intensity) factors: color consistency and colored GICP.

Reference: IntegratedColorConsistencyFactor / IntegratedColoredGICPFactor +
IntensityGradients (include/gtsam_points/factors/integrated_color_consistency_factor.hpp,
impl/integrated_color_consistency_factor_impl.hpp:102-147,
factors/intensity_gradients.hpp:20-76). Correspondences search XYZI space
(geometry + scaled intensity distance, the analogue of IntensityKdTree,
ann/intensity_kdtree.hpp); the photometric residual compares source intensity
against the target intensity extrapolated along its tangent-plane gradient.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.base import MatchingFactorMixin, register_factor
from gtsam_points_tpu.factors.linearized import inv3x3
from gtsam_points_tpu.ops.hash_grid import HashGrid, build_hash_grid, knn_search
from gtsam_points_tpu.types.frame import Frame
from gtsam_points_tpu.utils import se3


def estimate_intensity_gradients(frame: Frame, k: int = 10, grid: Optional[HashGrid] = None, grid_leaf: float = 1.0) -> jax.Array:
    """Per-point intensity gradient on the tangent plane: LSQ of dI vs
    plane-projected neighbor offsets, with the normal direction constrained to
    zero gradient (reference: IntensityGradients::estimate,
    src/gtsam_points/factors/intensity_gradients.cpp)."""
    if frame.normals is None or frame.intensities is None:
        raise ValueError("intensity gradients need normals + intensities")
    if grid is None:
        grid = build_hash_grid(frame.points, frame.mask, grid_leaf)
    idx, _, valid = knn_search(grid, frame.points, frame.mask, k)
    nbr = frame.points[jnp.maximum(idx, 0)]  # [N, k, 3]
    dI = frame.intensities[jnp.maximum(idx, 0)] - frame.intensities[:, None]  # [N, k]
    n = frame.normals  # [N, 3]
    dx = nbr - frame.points[:, None, :]
    # project offsets onto the tangent plane
    dx_t = dx - jnp.einsum("nkj,nj->nk", dx, n)[..., None] * n[:, None, :]
    w = valid.astype(jnp.float32)
    G = jnp.einsum("nki,nkj->nij", dx_t * w[..., None], dx_t) + jnp.einsum("ni,nj->nij", n, n)
    G = G + 1e-6 * jnp.eye(3, dtype=G.dtype)
    g = jnp.einsum("nki,nk->ni", dx_t * w[..., None], dI)
    return jnp.einsum("nij,nj->ni", inv3x3(G), g)


def _xyzi_knn(grid, target, moved, src_int, mask, k, intensity_scale, ncells, per_cell, max_sq):
    """1-NN in XYZI space via candidate gather from the 3D grid with
    intensity-augmented distance (reference: IntensityKdTree,
    include/gtsam_points/ann/intensity_kdtree.hpp:27)."""
    assert k == 1, "XYZI search is 1-NN only"
    from gtsam_points_tpu.ops import voxel_keys as vk
    from gtsam_points_tpu.ops.hash_grid import lookup_cells

    offsets = vk.neighbor_offsets(ncells)
    coords = vk.voxel_coords(moved, 1.0 / grid.leaf)
    nb_keys = vk.pack_coords(coords[:, None, :] + offsets[None, :, :])
    nb_keys = jnp.where(mask[:, None], nb_keys, vk.INVALID_KEY)
    cell_idx, found = lookup_cells(grid, nb_keys)
    rows = jnp.where(found, cell_idx, grid.cell_capacity - 1)
    q, o = rows.shape
    jj = grid.points_per_cell
    # packed-record gather (xyz + float index) + a per-cell intensity tile:
    # all candidate data arrives via wide-row gathers — a per-candidate
    # intensities[cidx] gather costs more than the whole search
    int_cells = target.intensities[jnp.maximum(grid.cell_pt_index, 0)]  # [C, J]
    rec = grid.cell_records[rows]  # [Q, O, J*4]
    c_int = int_cells[rows].reshape(q, o * jj)
    m4 = jnp.concatenate([moved, jnp.zeros((q, 1), moved.dtype)], axis=-1)
    dd = rec - jnp.tile(m4, (1, jj))[:, None, :]
    dd2 = dd * dd
    geo = (dd2[..., 0::4] + dd2[..., 1::4] + dd2[..., 2::4]).reshape(q, o * jj)
    cif = rec[..., 3::4].reshape(q, o * jj)  # float original index, -1 pad
    pho = (c_int - src_int[:, None]) ** 2
    d = geo + intensity_scale * pho
    ok = (cif >= 0) & (geo <= max_sq) & jnp.repeat(found, jj, axis=-1)
    d = jnp.where(ok, d, jnp.inf)
    best = jnp.min(d, axis=-1)
    idx = jnp.min(jnp.where(d == best[:, None], cif, jnp.float32(2**30)), axis=-1)
    tvalid = jnp.isfinite(best) & mask
    return jnp.where(tvalid, idx.astype(jnp.int32), -1)[:, None], tvalid[:, None]


@dataclasses.dataclass(frozen=True)
class ColorConsistencyFactor(MatchingFactorMixin):
    """Photometric-only cost (reference: IntegratedColorConsistencyFactor)."""

    target: Frame
    source: Frame
    target_gradients: jax.Array  # [N, 3]
    grid: HashGrid
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    max_corr_dist: float
    intensity_scale: float
    photometric_weight: float
    num_neighbor_cells: int
    max_points_per_cell: int

    def residual_closure(self, T_t, T_s):
        delta = se3.se3_inverse(T_t) @ T_s
        moved = se3.transform_points(delta, self.source.points)
        idx, valid = _xyzi_knn(
            self.grid, self.target, moved, self.source.intensities, self.source.mask,
            1, self.intensity_scale, self.num_neighbor_cells, self.max_points_per_cell,
            self.max_corr_dist**2,
        )
        corr = jnp.maximum(idx[:, 0], 0)
        ok = valid[:, 0]
        q = self.target.points[corr]
        n = self.target.normals[corr]
        grad = self.target_gradients[corr]
        I_t = self.target.intensities[corr]
        I_s = self.source.intensities
        w = self.photometric_weight

        def residual_fn(T_t_p, T_s_p):
            d = se3.se3_inverse(T_t_p) @ T_s_p
            p = se3.transform_points(d, self.source.points)
            offset = p - q
            proj = offset - jnp.sum(offset * n, axis=-1, keepdims=True) * n
            r = (I_t + jnp.sum(grad * proj, axis=-1) - I_s)[:, None] * jnp.sqrt(w)
            return r, None, ok

        return residual_fn


@dataclasses.dataclass(frozen=True)
class ColoredGICPFactor(MatchingFactorMixin):
    """Geometric GICP + photometric consistency combined (reference:
    IntegratedColoredGICPFactor, impl/integrated_colored_gicp_factor_impl.hpp)."""

    target: Frame
    source: Frame
    target_gradients: jax.Array
    grid: HashGrid
    fixed_target_pose: jax.Array
    target_key: int
    source_key: int
    max_corr_dist: float
    intensity_scale: float
    photometric_weight: float
    num_neighbor_cells: int
    max_points_per_cell: int

    def residual_closure(self, T_t, T_s):
        delta = se3.se3_inverse(T_t) @ T_s
        moved = se3.transform_points(delta, self.source.points)
        idx, valid = _xyzi_knn(
            self.grid, self.target, moved, self.source.intensities, self.source.mask,
            1, self.intensity_scale, self.num_neighbor_cells, self.max_points_per_cell,
            self.max_corr_dist**2,
        )
        corr = jnp.maximum(idx[:, 0], 0)
        ok = valid[:, 0]
        q = self.target.points[corr]
        n = self.target.normals[corr]
        grad = self.target_gradients[corr]
        I_t = self.target.intensities[corr]
        I_s = self.source.intensities
        C_t = self.target.covs[corr]
        R = delta[:3, :3]
        fused = C_t + jnp.einsum("ij,njk,lk->nil", R, self.source.covs, R)
        W3 = inv3x3(fused)
        w_pho = self.photometric_weight
        # 4D block-diag weight: [geometric 3x3, photometric 1]
        W = jnp.zeros(W3.shape[:-2] + (4, 4), dtype=W3.dtype)
        W = W.at[..., :3, :3].set(W3)
        W = W.at[..., 3, 3].set(w_pho)

        def residual_fn(T_t_p, T_s_p):
            d = se3.se3_inverse(T_t_p) @ T_s_p
            p = se3.transform_points(d, self.source.points)
            offset = p - q
            proj = offset - jnp.sum(offset * n, axis=-1, keepdims=True) * n
            r_pho = I_t + jnp.sum(grad * proj, axis=-1) - I_s
            r = jnp.concatenate([offset, r_pho[:, None]], axis=-1)
            return r, W, ok

        return residual_fn


def make_color_consistency_factor(
    target_key, source_key, target: Frame, source: Frame,
    target_gradients: Optional[jax.Array] = None,
    max_corr_dist: float = 2.0, intensity_scale: float = 1.0,
    photometric_weight: float = 1.0, grid_leaf: float = 1.0,
    num_neighbor_cells: int = 27, max_points_per_cell: int = 16,
    fixed_target_pose: Optional[jax.Array] = None,
):
    _require_color(target, source)
    if target.normals is None:
        raise ValueError("color consistency requires target normals")
    if target_gradients is None:
        target_gradients = estimate_intensity_gradients(target, grid_leaf=grid_leaf)
    return ColorConsistencyFactor(
        target=target, source=source, target_gradients=target_gradients,
        grid=build_hash_grid(target.points, target.mask, grid_leaf),
        fixed_target_pose=jnp.eye(4, dtype=jnp.float32) if fixed_target_pose is None else fixed_target_pose,
        target_key=target_key, source_key=source_key, max_corr_dist=max_corr_dist,
        intensity_scale=intensity_scale, photometric_weight=photometric_weight,
        num_neighbor_cells=num_neighbor_cells, max_points_per_cell=max_points_per_cell,
    )


def make_colored_gicp_factor(
    target_key, source_key, target: Frame, source: Frame,
    target_gradients: Optional[jax.Array] = None,
    max_corr_dist: float = 2.0, intensity_scale: float = 1.0,
    photometric_weight: float = 1.0, grid_leaf: float = 1.0,
    num_neighbor_cells: int = 27, max_points_per_cell: int = 16,
    fixed_target_pose: Optional[jax.Array] = None,
):
    _require_color(target, source)
    if target.covs is None or source.covs is None or target.normals is None:
        raise ValueError("colored GICP requires covs on both frames + target normals")
    if target_gradients is None:
        target_gradients = estimate_intensity_gradients(target, grid_leaf=grid_leaf)
    return ColoredGICPFactor(
        target=target, source=source, target_gradients=target_gradients,
        grid=build_hash_grid(target.points, target.mask, grid_leaf),
        fixed_target_pose=jnp.eye(4, dtype=jnp.float32) if fixed_target_pose is None else fixed_target_pose,
        target_key=target_key, source_key=source_key, max_corr_dist=max_corr_dist,
        intensity_scale=intensity_scale, photometric_weight=photometric_weight,
        num_neighbor_cells=num_neighbor_cells, max_points_per_cell=max_points_per_cell,
    )


def _require_color(target, source):
    if target.intensities is None or source.intensities is None:
        raise ValueError("colored factors require intensities on both frames")


_fields = ["target", "source", "target_gradients", "grid", "fixed_target_pose"]
_meta = [
    "target_key", "source_key", "max_corr_dist", "intensity_scale",
    "photometric_weight", "num_neighbor_cells", "max_points_per_cell",
]
register_factor(ColorConsistencyFactor, data_fields=_fields, meta_fields=_meta)
register_factor(ColoredGICPFactor, data_fields=_fields, meta_fields=_meta)


def estimate_intensity_gradients_ivox(vmap, num_neighbor_cells: int = 27):
    """Per-VOXEL intensity gradients maintained on an incremental voxel map —
    the TPU-native equivalent of the reference's experimental
    IntensityGradientsiVox (factors/experimental/intensity_gradients_ivox_.hpp:
    11-56: an iVox whose container estimates gradients from voxel neighbors so
    photometric factors can target an incremental map, no per-scan kNN).

    For each occupied cell: neighbors are the `num_neighbor_cells` adjacent
    cells' Gaussian+intensity moments (one probe fan-out, like
    estimate_normals_covs_moments); the gradient solves the same
    plane-projected LSQ as estimate_intensity_gradients with dx = neighbor
    mean - cell mean, dI = neighbor mean intensity - cell mean intensity, and
    the cell normal (smallest-eigenvector of the cell covariance) constrained
    to zero gradient. -> [C, 3] per-voxel gradients, aligned with the map's
    rows / `as_frame()` order; pair with `vmap.as_frame(with_normals=True)`
    to target ColorConsistencyFactor at a map."""
    from gtsam_points_tpu.ops import voxel_keys as vk
    from gtsam_points_tpu.ops.eigh3 import eigh3
    from gtsam_points_tpu.ops.voxelmap import finalize_intensity, finalize_mean, lookup_rows

    valid = vmap.keys != vk.INVALID_KEY
    mu = finalize_mean(vmap.moments)  # [C, 3]
    inten = finalize_intensity(vmap.moments)  # [C]

    offs = vk.neighbor_offsets(num_neighbor_cells)
    cell_coords = vk.unpack_key(vmap.keys)
    nb_keys = vk.pack_coords(cell_coords[:, None, :] + offs[None, :, :])
    nb_keys = jnp.where(valid[:, None], nb_keys, vk.INVALID_KEY)
    nb_rows, nb_found = lookup_rows(vmap, nb_keys)  # [C, O]
    rows = jnp.where(nb_found, nb_rows, 0)
    nb_mu = mu[rows]  # [C, O, 3]
    nb_int = inten[rows]  # [C, O]

    # cell normal from the cell covariance
    C6 = vmap.moments[:, 4:10] / jnp.maximum(vmap.moments[:, 0], 1.0)[:, None]
    mu2 = jnp.stack(
        [mu[:, 0] * mu[:, 0], mu[:, 0] * mu[:, 1], mu[:, 0] * mu[:, 2],
         mu[:, 1] * mu[:, 1], mu[:, 1] * mu[:, 2], mu[:, 2] * mu[:, 2]],
        axis=-1,
    )
    s = C6 - mu2
    cell_cov = jnp.stack(
        [jnp.stack([s[:, 0], s[:, 1], s[:, 2]], -1),
         jnp.stack([s[:, 1], s[:, 3], s[:, 4]], -1),
         jnp.stack([s[:, 2], s[:, 4], s[:, 5]], -1)],
        axis=-2,
    )
    _, vecs = eigh3(cell_cov + 1e-9 * jnp.eye(3))
    n = vecs[..., 0]  # [C, 3]

    w = (nb_found & valid[:, None]).astype(jnp.float32)
    # exclude the center cell (dx = 0 contributes nothing, but its dI is 0 too)
    dx = nb_mu - mu[:, None, :]
    dI = nb_int - inten[:, None]
    dx_t = dx - jnp.einsum("coj,cj->co", dx, n)[..., None] * n[:, None, :]
    G = jnp.einsum("coi,coj->cij", dx_t * w[..., None], dx_t) + jnp.einsum("ci,cj->cij", n, n)
    G = G + 1e-6 * jnp.eye(3, dtype=G.dtype)
    g = jnp.einsum("coi,co->ci", dx_t * w[..., None], dI)
    grads = jnp.einsum("cij,cj->ci", inv3x3(G), g)
    return jnp.where(valid[:, None], grads, 0.0)


def lookup_intensity_gradients_ivox(vmap, voxel_grads, points, mask):
    """Per-point gradient fetch from the map: one probe + one row gather
    (reference: IntensityGradientsiVox::intensity_gradient(i),
    intensity_gradients_ivox_.hpp:27-33). -> ([N, 3] gradients, found [N])."""
    from gtsam_points_tpu.ops.voxelmap import lookup_voxels

    row, found = lookup_voxels(vmap, points, mask)
    return jnp.where(found[:, None], voxel_grads[row], 0.0), found
