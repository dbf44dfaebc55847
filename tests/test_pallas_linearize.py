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
