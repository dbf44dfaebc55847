"""Scoped profilers (reference: util/easy_profiler.hpp:13-100,
util/stopwatch.hpp:10-27, util/easy_profiler_cuda.hpp). The device analogue of
the CUDA event profiler is jax.profiler tracing; EasyProfiler here blocks on
device completion at each segment boundary so wall times are honest."""

from __future__ import annotations

import time
from typing import Optional

import jax


class Stopwatch:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt


class EasyProfiler:
    """push(label) records a segment boundary; summary printed on close/exit.

    with EasyProfiler("align") as prof:
        prof.push("preprocess"); ...
        prof.push("optimize"); ...
    """

    def __init__(self, name: str = "profile", enabled: bool = True, sync: bool = True, out=None):
        self.name = name
        self.enabled = enabled
        self.sync = sync
        self.out = out
        self.marks: list[tuple[str, float]] = []

    def __enter__(self):
        self.push("begin")
        return self

    def push(self, label: str, block_on=None):
        if not self.enabled:
            return
        if block_on is not None and self.sync:
            jax.block_until_ready(block_on)
        self.marks.append((label, time.perf_counter()))

    def __exit__(self, *exc):
        self.push("end")
        if not self.enabled or len(self.marks) < 2:
            return False
        lines = [f"--- {self.name} ---"]
        for (l0, t0), (_, t1) in zip(self.marks[:-1], self.marks[1:]):
            lines.append(f"{l0:>24s}: {(t1 - t0) * 1e3:8.2f} ms")
        total = self.marks[-1][1] - self.marks[0][1]
        lines.append(f"{'total':>24s}: {total * 1e3:8.2f} ms")
        print("\n".join(lines), file=self.out)
        return False


def trace(log_dir: str):
    """Device-level tracing context (the CUDA-events analogue):
    with profiling.trace("/tmp/jax-trace"): ..."""
    return jax.profiler.trace(log_dir)
