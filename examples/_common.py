"""Shared demo boilerplate: platform selection + compile cache + data root."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA = os.environ.get("GTSAM_POINTS_DATA", "/root/reference/data")


def setup(description: str):
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--platform", default=None, help="'cpu' to force local CPU (default: TPU if available)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import gtsam_points_tpu  # noqa: F401  (pins matmul precision)

    return args
