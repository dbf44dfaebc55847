"""Pallas TPU kernels for the per-iteration hot path of matching-cost factors.

Given a FROZEN correspondence payload (mu [3,N] targets, W6 [6,N] symmetric
weights, mask [N]) and the current relative pose `delta`, every LM iteration
needs (a) the Gauss-Newton block system and (b) candidate-error evaluations.
In pure XLA these materialize the [12,3,N] Jacobian planes and their weighted
copies in HBM (~15 MB of traffic per call at N=25k). These kernels fuse the
SE3 transform, residual, weighting, Jacobian construction, and the block
reduction into one VMEM-resident pass per tile: the only HBM traffic is the
~15 f32/point input read, and the reduction runs as [16,T]x[T,16] MXU
contractions accumulated in a VMEM scratch.

This is the TPU analogue of the reference's fused transform-iterator + cub
reduction (src/gtsam_points/cuda/integrated_vgicp_derivatives_linearize.cu:
24-57, cuda/kernels/vgicp_derivatives.cuh:16-87): one launch per iteration,
per-point work never leaves on-chip memory.

Jacobian convention (right perturbation, matches ops/planar.py):
  J_t = [skew(pm) | -I],  J_s = [-R·skew(p) | R],  r = pm - mu,  pm = R p + t.

H/b/err come out of ONE matmul per residual dim by appending the residual as
a 13th row: M = [J_rows(12); r], H13 = sum_d M_d (Wm M)_dᵀ, so H = H13[:12,:12],
-b = H13[:12,12], err = H13[12,12]. The inlier count is accumulated into the
unused pad cell H13[13,13].

The public entry points fall back to the pure-XLA planar path off-TPU
(tests run on CPU), selected at trace time from the default backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gtsam_points_tpu.factors.linearized import Linearized

_TILE = 2048  # lanes per grid step (~16 rows x 2048 lanes x 6 arrays ~ 640 KB VMEM)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _mask_tile(m, pid, n_valid, tile):
    """Zero out lanes beyond the true point count (the padded tail of the
    last tile reads uninitialized memory — everything is gated on this)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + pid * tile
    return jnp.where(lane < n_valid, m, 0.0)


def _load_planar(p_ref, mu_ref, w_ref, m_ref, pid, n, tile):
    m = _mask_tile(m_ref[:], pid, n, tile)  # [1, T]
    ok = m > 0.0
    p = jnp.where(ok, p_ref[:], 0.0)  # [3, T]
    mu = jnp.where(ok, mu_ref[:], 0.0)
    w = jnp.where(ok, w_ref[:], 0.0)  # [6, T]
    return p, mu, w, m


def _transform(d_ref, p):
    """pm = R p + t with R,t scalars from the prefetched delta row; [3,T]."""
    rows = []
    for i in range(3):
        rows.append(
            d_ref[0, 4 * i + 0] * p[0:1]
            + d_ref[0, 4 * i + 1] * p[1:2]
            + d_ref[0, 4 * i + 2] * p[2:3]
            + d_ref[0, 4 * i + 3]
        )
    return jnp.concatenate(rows, axis=0)


def _sym_mul_rows(w, v0, v1, v2):
    """Symmetric planar W6 [6,T] times per-dim row blocks ([K,T] each)."""
    xx, xy, xz, yy, yz, zz = (w[i : i + 1] for i in range(6))
    return (
        xx * v0 + xy * v1 + xz * v2,
        xy * v0 + yy * v1 + yz * v2,
        xz * v0 + yz * v1 + zz * v2,
    )


def _linearize_kernel(d_ref, p_ref, mu_ref, w_ref, m_ref, out_ref, acc_ref, *, n: int, tile: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p, mu, w, m = _load_planar(p_ref, mu_ref, w_ref, m_ref, pid, n, tile)
    pm = _transform(d_ref, p)
    r = pm - mu
    wm = w * m  # weights carry the mask
    z = jnp.zeros((1, tile), jnp.float32)
    one = jnp.ones((1, tile), jnp.float32)

    # M_d [16, T] for each residual dim d: 12 Jacobian rows + r_d + 3 pad.
    # Row k of M_d = J[:, d, k] (J columns as planar planes):
    #   k 0..2  skew(pm) cols, k 3..5 -I cols, k 6..8 -R skew(p) cols, k 9..11 R cols
    R = [[d_ref[0, 4 * i + j] for j in range(3)] for i in range(3)]
    pmr = [pm[i : i + 1] for i in range(3)]
    pr = [p[i : i + 1] for i in range(3)]
    sk = ((z, pr[2], -pr[1]), (-pr[2], z, pr[0]), (pr[1], -pr[0], z))  # skew(p) cols
    spm = ((z, pmr[2], -pmr[1]), (-pmr[2], z, pmr[0]), (pmr[1], -pmr[0], z))

    def neg_R_skew(col, d):  # (-R @ skew(p)_col)[d]
        c = sk[col]
        return -(R[d][0] * c[0] + R[d][1] * c[1] + R[d][2] * c[2])

    M = []
    for d in range(3):
        rows = [spm[0][d], spm[1][d], spm[2][d]]
        rows += [-one if d == 0 else z, -one if d == 1 else z, -one if d == 2 else z]
        rows += [neg_R_skew(0, d), neg_R_skew(1, d), neg_R_skew(2, d)]
        rows += [R[d][0] * one, R[d][1] * one, R[d][2] * one]
        rows += [r[d : d + 1], z, z, z]
        M.append(jnp.concatenate(rows, axis=0))  # [16, T]

    # WM_d = sum_e W[d,e] M_e (symmetric weight couples residual dims)
    WM0, WM1, WM2 = _sym_mul_rows(wm, M[0], M[1], M[2])
    H16 = (
        lax.dot_general(M[0], WM0, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        + lax.dot_general(M[1], WM1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        + lax.dot_general(M[2], WM2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    )  # [16, 16]
    # inlier count into the unused pad cell [13, 13]
    row = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    H16 = H16 + jnp.where((row == 13) & (col == 13), jnp.sum(m), 0.0)
    acc_ref[:] += jnp.pad(H16, ((0, 0), (0, 112)))

    @pl.when(pid == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _error_kernel(d_ref, p_ref, mu_ref, w_ref, m_ref, out_ref, acc_ref, *, n: int, tile: int):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        acc_ref[0, 0] = 0.0

    p, mu, w, m = _load_planar(p_ref, mu_ref, w_ref, m_ref, pid, n, tile)
    pm = _transform(d_ref, p)
    r = pm - mu
    wm = w * m
    r0, r1, r2 = r[0:1], r[1:2], r[2:3]
    wr0, wr1, wr2 = _sym_mul_rows(wm, r0, r1, r2)
    acc_ref[0, 0] += jnp.sum(wr0 * r0 + wr1 * r1 + wr2 * r2)

    @pl.when(pid == pl.num_programs(0) - 1)
    def _():
        out_ref[0, 0] = acc_ref[0, 0]


def _pad_lanes(x, n_pad):
    if x.shape[-1] == n_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_pad - x.shape[-1])])


def _specs(tile):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return [
        pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((6, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]


@jax.jit
def _linearize_call(delta_row, p_src, mu, W6, mask_f):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = p_src.shape[-1]
    tile = min(_TILE, max(512, n))
    n_pad = -(-n // tile) * tile
    grid = n_pad // tile

    return pl.pallas_call(
        functools.partial(_linearize_kernel, n=n, tile=tile),
        grid=(grid,),
        in_specs=_specs(tile),
        out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32)],
    )(
        delta_row,
        _pad_lanes(p_src, n_pad),
        _pad_lanes(mu, n_pad),
        _pad_lanes(W6, n_pad),
        _pad_lanes(mask_f[None, :], n_pad),
    )


def linearize_fused(p_src, mu, W6, mask, delta) -> Linearized:
    """Fused (transform + residual + weight + Jacobian + reduce) on TPU;
    falls back to the XLA planar path elsewhere. Inputs are planar:
    p_src/mu [3, N], W6 [6, N], mask [N] bool, delta [4, 4]."""
    if not _on_tpu():
        from gtsam_points_tpu.ops import planar

        pm = planar.transform(delta, p_src)
        return planar.linearize_point_system(p_src, pm, pm - mu, W6, mask, delta[:3, :3])

    out = _linearize_call(delta.reshape(1, 16), p_src, mu, W6, mask.astype(jnp.float32))
    H = out[:12, :12]
    b = -out[:12, 12]
    return Linearized(
        H_tt=H[:6, :6],
        H_ss=H[6:, 6:],
        H_ts=H[:6, 6:],
        b_t=b[:6],
        b_s=b[6:],
        error=out[12, 12],
        num_inliers=out[13, 13].astype(jnp.int32),
    )


@jax.jit
def _error_call(delta_row, p_src, mu, W6, mask_f):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = p_src.shape[-1]
    tile = min(_TILE, max(512, n))
    n_pad = -(-n // tile) * tile
    grid = n_pad // tile

    out = pl.pallas_call(
        functools.partial(_error_kernel, n=n, tile=tile),
        grid=(grid,),
        in_specs=_specs(tile),
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(
        delta_row,
        _pad_lanes(p_src, n_pad),
        _pad_lanes(mu, n_pad),
        _pad_lanes(W6, n_pad),
        _pad_lanes(mask_f[None, :], n_pad),
    )
    return out[0, 0]


def error_fused(p_src, mu, W6, mask, delta) -> jax.Array:
    """Fused frozen-correspondence error sum rᵀWr on TPU; XLA planar fallback."""
    if not _on_tpu():
        from gtsam_points_tpu.ops import planar

        pm = planar.transform(delta, p_src)
        return planar.weighted_error(pm - mu, W6, mask)

    return _error_call(delta.reshape(1, 16), p_src, mu, W6, mask.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Moments-fused VGICP linearize: voxel-stat finalize + weight inversion +
# linearization + reduction in ONE kernel. The XLA side only probes the hash
# and gathers the raw [10]-lane moment rows; mean/cov finalize, the fused-cov
# regularization (or R C_src Rᵀ), the symmetric 3x3 inverse, and the block
# reduction never touch HBM. Saves a [6,N] weight round trip plus two
# elementwise passes vs the lookup_fetch_planar -> sym_inv -> linearize_fused
# pipeline (reference equivalent: the single fused device pass of
# cuda/kernels/vgicp_derivatives.cuh:16-87).
# ---------------------------------------------------------------------------


def _sym_inv_rows(xx, xy, xz, yy, yz, zz):
    """Closed-form symmetric 3x3 inverse on [1,T] row planes (same
    degenerate-input policy as ops/planar.sym_inv: near-singular -> zero)."""
    co_xx = yy * zz - yz * yz
    co_xy = -(xy * zz - yz * xz)
    co_xz = xy * yz - yy * xz
    det = xx * co_xx + xy * co_xy + xz * co_xz
    scale = (jnp.abs(xx) + jnp.abs(yy) + jnp.abs(zz)) / 3.0
    bad = jnp.abs(det) <= 1e-9 * scale * scale * scale + 1e-30
    inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
    co_yy = xx * zz - xz * xz
    co_yz = -(xx * yz - xy * xz)
    co_zz = xx * yy - xy * xy
    return tuple(c * inv_det for c in (co_xx, co_xy, co_xz, co_yy, co_yz, co_zz))


def _vgicp_moments_kernel(
    d_ref, s_ref, p_ref, mom_ref, m_ref, sc_ref_or_out, *rest, n: int, tile: int, with_src_covs: bool
):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    if with_src_covs:
        sc_ref, out_ref, acc_ref = sc_ref_or_out, rest[0], rest[1]
    else:
        sc_ref, out_ref, acc_ref = None, sc_ref_or_out, rest[0]

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mvp = s_ref[0, 0]
    eps = s_ref[0, 1]
    m = _mask_tile(m_ref[:], pid, n, tile)  # [1, T]
    mom = mom_ref[:]  # [10, T]
    cnt = mom[0:1]
    m = jnp.where(cnt >= mvp, m, 0.0)
    ok = m > 0.0
    p = jnp.where(ok, p_ref[:], 0.0)  # [3, T]
    safe = jnp.maximum(cnt, 1.0)
    mu = jnp.where(ok, mom[1:4] / safe, 0.0)  # [3, T]
    mu0, mu1, mu2 = mu[0:1], mu[1:2], mu[2:3]
    s6 = mom[4:10] / safe
    # target voxel covariance (raw second moment minus outer(mu))
    cxx = s6[0:1] - mu0 * mu0
    cxy = s6[1:2] - mu0 * mu1
    cxz = s6[2:3] - mu0 * mu2
    cyy = s6[3:4] - mu1 * mu1
    cyz = s6[4:5] - mu1 * mu2
    czz = s6[5:6] - mu2 * mu2

    R = [[d_ref[0, 4 * i + j] for j in range(3)] for i in range(3)]
    if with_src_covs:
        sc = jnp.where(ok, sc_ref[:], 0.0)  # [6, T] source covs (planar)
        C = (
            (sc[0:1], sc[1:2], sc[2:3]),
            (sc[1:2], sc[3:4], sc[4:5]),
            (sc[2:3], sc[4:5], sc[5:6]),
        )
        # M = C Rᵀ; fused += R M (congruence R C Rᵀ), upper triangle
        M = [
            [C[i][0] * R[j][0] + C[i][1] * R[j][1] + C[i][2] * R[j][2] for j in range(3)]
            for i in range(3)
        ]

        def entry(i, j):
            return R[i][0] * M[0][j] + R[i][1] * M[1][j] + R[i][2] * M[2][j]

        cxx = cxx + entry(0, 0)
        cxy = cxy + entry(0, 1)
        cxz = cxz + entry(0, 2)
        cyy = cyy + entry(1, 1)
        cyz = cyz + entry(1, 2)
        czz = czz + entry(2, 2)
    else:
        cxx = cxx + eps
        cyy = cyy + eps
        czz = czz + eps

    w = jnp.concatenate(_sym_inv_rows(cxx, cxy, cxz, cyy, cyz, czz), axis=0)  # [6, T]

    pm = _transform(d_ref, p)
    r = pm - mu
    wm = w * m
    z = jnp.zeros((1, tile), jnp.float32)
    one = jnp.ones((1, tile), jnp.float32)

    pmr = [pm[i : i + 1] for i in range(3)]
    pr = [p[i : i + 1] for i in range(3)]
    sk = ((z, pr[2], -pr[1]), (-pr[2], z, pr[0]), (pr[1], -pr[0], z))
    spm = ((z, pmr[2], -pmr[1]), (-pmr[2], z, pmr[0]), (pmr[1], -pmr[0], z))

    def neg_R_skew(col, d):
        c = sk[col]
        return -(R[d][0] * c[0] + R[d][1] * c[1] + R[d][2] * c[2])

    M_rows = []
    for d in range(3):
        rows = [spm[0][d], spm[1][d], spm[2][d]]
        rows += [-one if d == 0 else z, -one if d == 1 else z, -one if d == 2 else z]
        rows += [neg_R_skew(0, d), neg_R_skew(1, d), neg_R_skew(2, d)]
        rows += [R[d][0] * one, R[d][1] * one, R[d][2] * one]
        rows += [r[d : d + 1], z, z, z]
        M_rows.append(jnp.concatenate(rows, axis=0))  # [16, T]

    WM0, WM1, WM2 = _sym_mul_rows(wm, M_rows[0], M_rows[1], M_rows[2])
    H16 = (
        lax.dot_general(M_rows[0], WM0, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        + lax.dot_general(M_rows[1], WM1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        + lax.dot_general(M_rows[2], WM2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    H16 = H16 + jnp.where((row == 13) & (col == 13), jnp.sum(m), 0.0)
    acc_ref[:] += jnp.pad(H16, ((0, 0), (0, 112)))

    @pl.when(pid == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("with_src_covs",))
def _vgicp_moments_call(delta_row, scalars, p_src, momT, mask_f, sc6, with_src_covs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = p_src.shape[-1]
    tile = min(_TILE, max(512, n))
    n_pad = -(-n // tile) * tile
    grid = n_pad // tile

    in_specs = [
        pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((10, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [
        delta_row,
        scalars,
        _pad_lanes(p_src, n_pad),
        _pad_lanes(momT, n_pad),
        _pad_lanes(mask_f[None, :], n_pad),
    ]
    if with_src_covs:
        in_specs.append(pl.BlockSpec((6, tile), lambda i: (0, i), memory_space=pltpu.VMEM))
        args.append(_pad_lanes(sc6, n_pad))

    return pl.pallas_call(
        functools.partial(
            _vgicp_moments_kernel, n=n, tile=tile, with_src_covs=with_src_covs
        ),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32)],
    )(*args)


def linearize_vgicp_moments(
    p_src, momT, found, delta, min_voxel_points, eps=1e-3, src_covs6=None
) -> Linearized:
    """Fused VGICP linearize from RAW gathered voxel-moment rows.

    p_src [3,N] source points; momT [10,N] = gathered moment lanes 0..9
    (count, sum p, sum ppT); found [N] bool (hash probe hit & frame mask);
    delta [4,4]; src_covs6 [6,N] planar source covs (GICP D2D) or None
    (point-to-distribution with eps*I regularization). Finalize, fused-cov,
    weight inversion, Jacobians, and the 12x12 reduction all run in-kernel.
    Falls back to the equivalent XLA planar pipeline off-TPU."""
    if not _on_tpu():
        return linearize_vgicp_moments_xla(
            p_src, momT, found, delta, min_voxel_points, eps, src_covs6
        )

    scalars = jnp.stack([jnp.float32(min_voxel_points), jnp.float32(eps)]).reshape(1, 2)
    out = _vgicp_moments_call(
        delta.reshape(1, 16),
        scalars,
        p_src,
        momT,
        found.astype(jnp.float32),
        src_covs6,  # None (empty pytree) when unused — no dummy traced input
        src_covs6 is not None,
    )
    H = out[:12, :12]
    b = -out[:12, 12]
    return Linearized(
        H_tt=H[:6, :6],
        H_ss=H[6:, 6:],
        H_ts=H[:6, 6:],
        b_t=b[:6],
        b_s=b[6:],
        error=out[12, 12],
        num_inliers=out[13, 13].astype(jnp.int32),
    )


def linearize_vgicp_moments_xla(
    p_src, momT, found, delta, min_voxel_points, eps=1e-3, src_covs6=None
) -> Linearized:
    """Pure-XLA equivalent of the moments-fused kernel (the off-TPU fallback,
    also callable explicitly for on-device parity/perf racing —
    scripts/tpu_parity.py)."""
    from gtsam_points_tpu.ops import planar

    cnt = momT[0]
    ok = found & (cnt >= min_voxel_points)
    safe = jnp.maximum(cnt, 1.0)
    mu = momT[1:4] / safe
    mu2 = jnp.stack(
        [mu[0] * mu[0], mu[0] * mu[1], mu[0] * mu[2], mu[1] * mu[1], mu[1] * mu[2], mu[2] * mu[2]]
    )
    C6 = momT[4:10] / safe - mu2
    if src_covs6 is not None:
        fused = C6 + planar.sym_rotate(delta[:3, :3], src_covs6)
    else:
        eye6 = jnp.asarray([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], C6.dtype) * eps
        fused = C6 + eye6[:, None]
    W6 = planar.sym_inv(fused)
    pm = planar.transform(delta, p_src)
    return planar.linearize_point_system(p_src, pm, pm - mu, W6, ok, delta[:3, :3])


def vgicp_scan_linearize(
    vmap, p_src, mask, delta, min_voxel_points, eps=1e-3, src_covs6=None
) -> Linearized:
    """One-call scan-to-map VGICP linearize: transform + hash probe + raw
    moment gather (XLA) feeding the moments-fused kernel. Drop-in for GN
    registration loops (bench.py's gn_register body is the linearize_fused
    equivalent; this variant additionally fuses finalize+weights in-kernel —
    validated in interpret mode + CPU fallback, see
    tests/test_pallas_linearize.py)."""
    from gtsam_points_tpu.ops import planar as _planar
    from gtsam_points_tpu.ops import voxel_keys as _vk
    from gtsam_points_tpu.ops.voxelmap import table_probe as _tprobe

    pm = _planar.transform(delta, p_src)
    keys = _vk.point_keys_planar(pm, mask, vmap.leaf)
    # ONE 128-lane bucket-row gather delivers key match + the full moment
    # record (ops/voxelmap.build_probe_table). Round 3 spent 0.21 ms/scan in
    # 2 probe gathers + 1 moment-row gather here; the bucketed table cuts the
    # whole lookup to ~0.04 ms (gathers cost per-GATHER on TPU, not per-lane).
    # The record select stays in XLA (elementwise, fused into the gather
    # consumer); pick.T is the one [N,16]->[16,N] relayout.
    _, found, pick, _ = _tprobe(vmap.table, keys)
    momT = pick.T[2:12]  # [10, N] = (count, sum p, sum ppT) planar
    return linearize_vgicp_moments(
        p_src, momT, found & mask, delta, min_voxel_points, eps, src_covs6
    )
