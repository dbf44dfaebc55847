"""The repo-wide benchmark timing protocol, in ONE place.

Every published number (bench.py, bench_suite.py, bench_scaling.py,
scripts/tpu_parity.py, scripts/bench_*.py) measures steady-state MARGINAL
cost: the tunneled TPU in this image adds a large fixed synchronization cost
to every host-blocking round trip of a program containing a device loop
(tunnel artifact, not device time), so a chain of K1 and a chain of K2 > K1
back-to-back executions are timed with one final block each, and
(t(K2) - t(K1)) / (K2 - K1) differences the constant term out. Raw
(sync-inclusive) per-unit time is t(K2) / K2. Trials take the median.

Centralized (round-3 review finding) so a protocol change — trial count,
outlier policy, probe shape — lands everywhere at once instead of drifting
across five hand-rolled copies.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple


def chain_marginal(
    run_chain: Callable[[int], None],
    k1: int,
    k2: int,
    trials: int = 5,
) -> Tuple[float, float]:
    """-> (marginal_seconds_per_unit, raw_seconds_per_unit).

    `run_chain(K)` must execute K data-dependent chained units (so nothing
    can be elided or overlapped past the chain) and block until ready."""

    def t(k: int) -> float:
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            run_chain(k)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    t1, t2 = t(k1), t(k2)
    return (t2 - t1) / (k2 - k1), t2 / k2


def tunnel_probe_ms(trials: int = 5, chain: int = 20) -> float:
    """Median ms per trivial chained dispatch — the health probe that tells a
    degraded tunnel apart from a kernel regression in bench artifacts."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    jax.block_until_ready(f(x))

    def run(k: int) -> None:
        y = x
        for _ in range(k):
            y = f(y)
        jax.block_until_ready(y)

    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        run(chain)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / chain * 1000.0
