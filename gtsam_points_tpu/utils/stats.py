"""Small stateful utilities mirrored from the reference's util layer:
RunningStatistics (util/running_statistics.hpp) and IndexedSlidingWindow
(util/indexed_sliding_window.hpp:16)."""

from __future__ import annotations

from typing import Generic, List, NamedTuple, Optional, TypeVar

import jax
import jax.numpy as jnp

T = TypeVar("T")


class RunningStatistics(NamedTuple):
    """Online mean/variance as an immutable pytree (Welford in moment form);
    used for eigenvalue gating in the incremental covariance voxelmap."""

    count: jax.Array  # ()
    total: jax.Array  # [...]
    sq_total: jax.Array  # [...]

    @staticmethod
    def empty(shape=(), dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        return RunningStatistics(count=jnp.float32(0.0), total=z, sq_total=z)

    def add(self, x) -> "RunningStatistics":
        return RunningStatistics(self.count + 1.0, self.total + x, self.sq_total + x * x)

    def mean(self):
        return self.total / jnp.maximum(self.count, 1.0)

    def var(self):
        m = self.mean()
        return self.sq_total / jnp.maximum(self.count, 1.0) - m * m

    def std(self):
        return jnp.sqrt(jnp.maximum(self.var(), 0.0))


class IndexedSlidingWindow(Generic[T]):
    """Deque with stable absolute indexing (reference:
    util/indexed_sliding_window.hpp): window[i] addresses by the index at
    insertion time even after old entries are dropped."""

    def __init__(self, max_size: int):
        self.max_size = max_size
        self._items: List[T] = []
        self._first_index = 0

    def push(self, item: T) -> int:
        self._items.append(item)
        idx = self._first_index + len(self._items) - 1
        while len(self._items) > self.max_size:
            self._items.pop(0)
            self._first_index += 1
        return idx

    def __getitem__(self, index: int) -> T:
        i = index - self._first_index
        if i < 0 or i >= len(self._items):
            raise IndexError(f"index {index} outside window [{self._first_index}, {self.last_index}]")
        return self._items[i]

    def __contains__(self, index: int) -> bool:
        return self._first_index <= index <= self.last_index

    @property
    def first_index(self) -> int:
        return self._first_index

    @property
    def last_index(self) -> int:
        return self._first_index + len(self._items) - 1

    def __len__(self):
        return len(self._items)
