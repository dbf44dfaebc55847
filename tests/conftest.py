"""Test harness: run on CPU with 8 virtual devices so sharding/collective
paths are exercised without TPU hardware (mirrors how the reference holds GPU
factors to CPU accuracy bounds rather than requiring GPU runners — reference:
src/test/test_matching_cost_factors.cpp:80-101)."""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev environment pins
# JAX_PLATFORMS to a tunneled TPU; tests must run locally on virtual devices).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# This container has 2 slow cores; XLA compiles dominate test time. Cache them.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


DATA = os.environ.get("GTSAM_POINTS_DATA", "/root/reference/data")


def pytest_configure(config):
    np.random.seed(0)


@pytest.fixture(scope="session")
def data_root():
    if not os.path.isdir(DATA):
        pytest.skip("reference data not available")
    return DATA
