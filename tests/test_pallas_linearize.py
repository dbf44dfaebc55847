"""Pallas fused linearization kernel vs the XLA planar reference, run in
Mosaic interpret mode on CPU (the kernel itself executes on TPU in prod;
tests hold it to the same outputs as the planar path — the reference holds
its GPU kernels to CPU results the same way, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_points_tpu.factors.linearized import Linearized
from gtsam_points_tpu.ops import planar
import gtsam_points_tpu.ops.pallas_linearize as PL
from gtsam_points_tpu.utils import se3


@pytest.fixture(scope="module")
def payload():
    rng = np.random.RandomState(3)
    n = 3000  # deliberately not a multiple of the tile size
    p = jnp.asarray(rng.randn(3, n).astype(np.float32) * 5)
    mu = p + jnp.asarray(rng.randn(3, n).astype(np.float32) * 0.1)
    A = rng.randn(n, 3, 3).astype(np.float32)
    W = np.einsum("nij,nkj->nik", A, A) + np.eye(3, dtype=np.float32) * 0.1
    W6 = jnp.asarray(np.stack([W[:, 0, 0], W[:, 0, 1], W[:, 0, 2], W[:, 1, 1], W[:, 1, 2], W[:, 2, 2]]))
    mask = jnp.asarray(rng.rand(n) > 0.25)
    delta = se3.se3_exp(jnp.asarray([0.03, -0.02, 0.05, 0.4, -0.2, 0.3]))
    return p, mu, W6, mask, delta


def _reference(p, mu, W6, mask, delta) -> Linearized:
    pm = planar.transform(delta, p)
    return planar.linearize_point_system(p, pm, pm - mu, W6, mask, delta[:3, :3])


def test_linearize_kernel_matches_planar(payload, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    p, mu, W6, mask, delta = payload
    monkeypatch.setattr(PL, "_on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        lin = PL.linearize_fused(p, mu, W6, mask, delta)
    ref = _reference(p, mu, W6, mask, delta)
    for f in Linearized._fields:
        a, b = np.asarray(getattr(lin, f)), np.asarray(getattr(ref, f))
        scale = np.max(np.abs(b)) + 1e-9
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * scale, err_msg=f)


def test_error_kernel_matches_planar(payload, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    p, mu, W6, mask, delta = payload
    monkeypatch.setattr(PL, "_on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        e = PL.error_fused(p, mu, W6, mask, delta)
    ref = planar.weighted_error(planar.transform(delta, p) - mu, W6, mask)
    assert abs(float(e) - float(ref)) < 1e-4 * abs(float(ref))


def test_fallback_path_off_tpu(payload):
    """Off-TPU the public entry points must route to the planar XLA path."""
    p, mu, W6, mask, delta = payload
    lin = PL.linearize_fused(p, mu, W6, mask, delta)
    ref = _reference(p, mu, W6, mask, delta)
    np.testing.assert_allclose(np.asarray(lin.H_tt), np.asarray(ref.H_tt), rtol=1e-5)


@pytest.fixture(scope="module")
def moments_payload():
    """Scan-to-map payload: a voxel map over a box scene + a displaced source."""
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.types.frame import make_frame

    rng = np.random.RandomState(11)
    n = 3000
    pts = (rng.rand(n, 3).astype(np.float32) * 16 - 8)
    target = make_frame(pts, capacity=n)
    vm = build_voxelmap(target, 1.0)
    T = se3.se3_exp(jnp.asarray([0.01, -0.02, 0.015, 0.1, -0.05, 0.08]))
    src_pts = np.asarray(se3.transform_points(se3.se3_inverse(T), jnp.asarray(pts)))
    covs = np.einsum(
        "nij,nkj->nik", rng.randn(n, 3, 3).astype(np.float32) * 0.05, rng.randn(n, 3, 3).astype(np.float32) * 0.05
    ) + np.eye(3, dtype=np.float32) * 0.01
    src = make_frame(src_pts, covs=covs.astype(np.float32), capacity=n)
    covs6 = jnp.stack([covs[:, 0, 0], covs[:, 0, 1], covs[:, 0, 2], covs[:, 1, 1], covs[:, 1, 2], covs[:, 2, 2]]).astype(jnp.float32)
    return vm, src, covs6, jnp.eye(4)


def test_moments_kernel_matches_fallback(moments_payload, monkeypatch):
    """The moments-fused kernel (interpret mode) == its XLA fallback — which
    itself is exactly the lookup_fetch_planar -> sym_inv -> planar pipeline
    (asserted in test_scan_linearize_matches_classic_pipeline)."""
    from jax.experimental.pallas import tpu as pltpu
    from gtsam_points_tpu.ops import voxel_keys as vk
    from gtsam_points_tpu.ops.voxelmap import lookup_rows

    vm, src, covs6, delta = moments_payload
    pts_p = src.points.T
    pm = planar.transform(delta, pts_p)
    keys = vk.point_keys_planar(pm, src.mask, vm.leaf)
    row, found = lookup_rows(vm, keys)
    momT = vm.moments[row, :10].T
    found = found & src.mask

    for sc in (None, covs6):
        ref = PL.linearize_vgicp_moments(pts_p, momT, found, delta, 4.0, src_covs6=sc)
        monkeypatch.setattr(PL, "_on_tpu", lambda: True)
        with pltpu.force_tpu_interpret_mode():
            lin = PL.linearize_vgicp_moments(pts_p, momT, found, delta, 4.0, src_covs6=sc)
        monkeypatch.setattr(PL, "_on_tpu", lambda: False)
        assert int(lin.num_inliers) == int(ref.num_inliers) > 0
        # tolerance note: voxel covs come from raw moments (sum ppT/n - mu mu^T),
        # whose f32 cancellation at |p|~8 amplifies rounding-order differences
        # between the kernel and XLA to ~2e-4 relative; 2e-3*scale still
        # catches any real math error (wrong Jacobian terms shift H by >>1%).
        for f in ["H_tt", "H_ss", "H_ts", "b_t", "b_s", "error"]:
            a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(lin, f))
            scale = max(np.max(np.abs(a)), 1.0)
            np.testing.assert_allclose(b, a, rtol=0, atol=2e-3 * scale, err_msg=f)


def test_scan_linearize_matches_classic_pipeline(moments_payload):
    """vgicp_scan_linearize (one-call probe+gather+fused kernel path, here via
    its XLA fallback) == the classic lookup_fetch_planar pipeline bit-exact."""
    from gtsam_points_tpu.ops.voxelmap import lookup_fetch_planar

    vm, src, covs6, delta = moments_payload
    pts_p = src.points.T
    pm = planar.transform(delta, pts_p)
    found, cnt, mu, C6 = lookup_fetch_planar(vm, pm, src.mask)
    ok = found & (cnt >= 4.0)
    fused = C6 + planar.sym_rotate(delta[:3, :3], covs6)
    ref = planar.linearize_point_system(pts_p, pm, pm - mu, planar.sym_inv(fused), ok, delta[:3, :3])
    new = PL.vgicp_scan_linearize(vm, pts_p, src.mask, delta, 4.0, src_covs6=covs6)
    for f in ["H_tt", "H_ss", "b_t", "b_s", "error", "num_inliers"]:
        np.testing.assert_allclose(
            np.asarray(getattr(new, f)), np.asarray(getattr(ref, f)), rtol=1e-5, atol=1e-5, err_msg=f
        )
