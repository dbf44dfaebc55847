"""gtsam_points_tpu — a TPU-native range-based SLAM engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of koide3/gtsam_points
(/root/reference) for TPU hardware:

- Fixed-shape struct-of-arrays `Frame` pytrees instead of pointer-based
  point clouds (reference: include/gtsam_points/types/point_cloud.hpp:19).
- Batched grid/hash neighbor search instead of pointer-chasing KdTrees
  (reference: include/gtsam_points/ann/small_kdtree.hpp).
- Factors as pure residual functions, linearized by one fused jitted
  program per optimizer iteration instead of per-factor virtual dispatch
  (reference: include/gtsam_points/factors/integrated_matching_cost_factor.hpp).
- Multi-device scaling via jax.sharding Mesh + psum of Gauss-Newton blocks
  (the reference is single-process/single-GPU; this layer is new).
"""

import jax as _jax

# Geometry/optimization code is precision-sensitive: TPU matmuls default to
# bfloat16 inputs, which breaks registration accuracy bounds (rot < 0.015 rad).
# Pin full-f32 matmul precision; hot kernels opt into lower precision locally.
_jax.config.update("jax_default_matmul_precision", "highest")

from gtsam_points_tpu.types.frame import Frame, make_frame, transform_frame, merge_frames
from gtsam_points_tpu.utils import se3

__version__ = "0.1.0"
