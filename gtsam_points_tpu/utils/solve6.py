"""Unrolled 6x6 SPD solve for the registration hot loop.

jax.scipy.linalg.cho_factor/cho_solve on [B, 6, 6] batches lowers to XLA's
generic blocked Cholesky + two triangular solves — sequential
dynamic-update-slice loops over tensors whose 6-wide lane axis pads to 128,
a disproportionate fixed cost inside a GN iteration (the batched
registration pays it B=64 times per iteration, and the single-stream LM
pays it per candidate evaluation; reference analogue: the fixed 6x6 solve
inside every LM iteration, optimizers/levenberg_marquardt_ext.cpp:181-330).

This module unrolls the 6x6 Cholesky (21 multiplies + substitutions) into
straight-line scalar-indexed elementwise ops that vectorize over any batch
prefix on the VPU with zero loop or padding overhead. f32 throughout;
identical math to cho_solve up to roundoff (oracle-checked in
tests/test_se3.py).
"""

from __future__ import annotations

import jax.numpy as jnp


UNROLL_MAX = 18  # beyond ~3 pose blocks the op-count (~n^3/3) stops paying


def solve_small(H, b):
    """Solve H x = b for SPD H [..., n, n], b [..., n] -> x [..., n], with
    the Cholesky fully unrolled for static n <= UNROLL_MAX (straight-line
    elementwise ops, batch dims broadcast on the VPU). Falls back to
    jax.scipy cho_solve for larger n, where the unrolled op count stops
    being profitable and compile time grows cubically."""
    n = H.shape[-1]
    if n > UNROLL_MAX:
        import jax.scipy.linalg as jsl

        return jsl.cho_solve(jsl.cho_factor(H, lower=True), b)
    a = [[H[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d[j]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_d[i]
    # back: L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_d[i]
    return jnp.stack(x, axis=-1)


def solve6(H, b):
    """6x6 alias of solve_small (the registration GN hot path)."""
    return solve_small(H, b)
