"""Test harness: run on CPU with 8 virtual devices so sharding/collective
paths are exercised without TPU hardware (mirrors how the reference holds GPU
factors to CPU accuracy bounds rather than requiring GPU runners — reference:
src/test/test_matching_cost_factors.cpp:80-101).

CRITICAL environment note: the dev container's sitecustomize registers a
tunneled TPU backend ("axon") and hard-sets jax_platforms="axon,cpu" at
interpreter start — env vars like JAX_PLATFORMS are ignored, and the tunnel
admits ONE client process at a time (a second jax process blocks until the
first exits). Tests must therefore switch to CPU via jax.config.update AFTER
importing jax; this also makes compiles local and fast."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Cache compiles across runs (first-run suites are compile-dominated).
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

DATA = os.environ.get("GTSAM_POINTS_DATA", "/root/reference/data")


def pytest_configure(config):
    np.random.seed(0)


@pytest.fixture(scope="session")
def data_root():
    if not os.path.isdir(DATA):
        pytest.skip("reference data not available")
    return DATA
