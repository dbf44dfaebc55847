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


def solve6(H, b):
    """Solve H x = b for SPD H [..., 6, 6], b [..., 6] -> x [..., 6].

    Unrolled Cholesky H = L L^T, then forward/back substitution. Batch
    dims broadcast elementwise; no lax loops, no triangular-solve kernels."""
    a = [[H[..., i, j] for j in range(6)] for i in range(6)]
    L = [[None] * 6 for _ in range(6)]
    inv_d = [None] * 6
    for j in range(6):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, 6):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d[j]
    # forward: L y = b
    y = [None] * 6
    for i in range(6):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_d[i]
    # back: L^T x = y
    x = [None] * 6
    for i in range(5, -1, -1):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_d[i]
    return jnp.stack(x, axis=-1)
