"""Host-RAM offload pool for over-HBM data (voxel map tiles, keyframe clouds).

TPU analogue of the reference's OffloadableGPU LRU offloading
(include/gtsam_points/types/offloadable.hpp:19-50, touch/offload_gpu/
reload_gpu with a global access-time counter): long mapping sessions
accumulate more submap voxel maps and keyframes than one chip's HBM holds;
cold entries spill to host RAM as numpy arrays and reload on touch.

Pure-functional jax makes this a registry-of-pytrees problem rather than a
base-class one: an OffloadPool owns named entries, each either device-resident
(jax Arrays) or host-resident (numpy). `touch(name)` reloads + bumps the
access clock; `ensure_budget()` evicts least-recently-touched entries until
device usage fits the budget; `put()` auto-evicts to stay under budget.

The reference spills with cudaMemcpyAsync on a stream; here reload/offload are
jax.device_put / jax.device_get — async under dispatch, synchronous on fetch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from gtsam_points_tpu.utils.memory import nbytes


class _Entry:
    __slots__ = ("tree", "on_device", "last_access", "bytes")

    def __init__(self, tree, on_device: bool, last_access: int, num_bytes: int):
        self.tree = tree
        self.on_device = on_device
        self.last_access = last_access
        self.bytes = num_bytes


class OffloadPool:
    """LRU host-offload registry for device pytrees.

    device_budget_bytes bounds the total bytes of device-resident entries the
    pool manages (the working set outside the pool — live jit buffers — is the
    caller's headroom to leave).
    """

    def __init__(self, device_budget_bytes: int, device=None):
        self.budget = int(device_budget_bytes)
        self.device = device if device is not None else jax.devices()[0]
        self._entries: Dict[str, _Entry] = {}
        self._clock = 0

    # -- reference-API mirrors ------------------------------------------------

    def current_access_time(self) -> int:
        return self._clock

    def last_accessed_time(self, name: str) -> int:
        return self._entries[name].last_access

    def loaded_on_device(self, name: str) -> bool:
        return self._entries[name].on_device

    def memory_usage_device(self) -> int:
        return sum(e.bytes for e in self._entries.values() if e.on_device)

    # -- core -----------------------------------------------------------------

    def put(self, name: str, tree) -> None:
        """Register (or replace) a device pytree; evicts cold entries if the
        budget would be exceeded."""
        self._clock += 1
        b = nbytes(tree)
        self._entries[name] = _Entry(tree, True, self._clock, b)
        self.ensure_budget()

    def touch(self, name: str):
        """Reload to device if offloaded (reference: touch), bump the access
        clock, and return the device-resident pytree."""
        e = self._entries[name]
        self._clock += 1
        e.last_access = self._clock
        if not e.on_device:
            e.tree = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.device), e.tree
            )
            e.on_device = True
            self.ensure_budget(exempt=name)
        return e.tree

    def offload(self, name: str) -> bool:
        """Spill to host RAM (reference: offload_gpu). True if a spill ran."""
        e = self._entries[name]
        if not e.on_device:
            return False
        e.tree = jax.tree_util.tree_map(lambda x: np.asarray(x), e.tree)
        e.on_device = False
        return True

    def reload(self, name: str) -> bool:
        """(reference: reload_gpu). True if an upload ran."""
        e = self._entries[name]
        if e.on_device:
            return False
        self.touch(name)
        return True

    def ensure_budget(self, exempt: Optional[str] = None) -> int:
        """Evict least-recently-touched device entries until under budget.
        Returns the number of entries spilled."""
        spilled = 0
        while self.memory_usage_device() > self.budget:
            candidates = [
                (e.last_access, n)
                for n, e in self._entries.items()
                if e.on_device and n != exempt
            ]
            if not candidates:
                break
            _, victim = min(candidates)
            self.offload(victim)
            spilled += 1
        return spilled

    def remove(self, name: str) -> None:
        self._entries.pop(name, None)

    def names(self):
        return list(self._entries)
