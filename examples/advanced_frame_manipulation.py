"""Feeding custom point containers to scan-matching factors
(reference: src/example/advanced_frame_manipulation.cpp — specializing
frame::traits<> so an std::vector<Eigen::Vector4d> can be consumed by
IntegratedICPFactor).

In the TPU-native design the Frame pytree IS the traits layer: any code that
can produce `points [N,3]` + `mask [N]` arrays can participate in matching —
no template specialization needed. This demo registers two "custom" targets
with the same ICP factor:
  1. a Frame wrapped directly around user-owned device arrays (zero copy), and
  2. a Gaussian voxel map exposed through .as_frame() — the analogue of
     matching against an iVox/GaussianVoxelMapCPU via frame traits
     (reference: ann/impl/incremental_voxelmap_impl.hpp:163-228).

Run: python examples/advanced_frame_manipulation.py [--platform cpu]
"""

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp

    from gtsam_points_tpu.factors import PriorFactor, make_icp_factor
    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.voxelmap import build_voxelmap
    from gtsam_points_tpu.optim import FactorGraph, optimize_lm
    from gtsam_points_tpu.types.frame import Frame, make_frame
    from gtsam_points_tpu.utils import io, se3

    raw_t = io.read_points(f"{DATA}/kitti_00/000000.bin")
    raw_s = io.read_points(f"{DATA}/kitti_00/000001.bin")

    # --- 1. "Custom container": user-owned jnp arrays wrapped in a Frame ----
    # No copy, no make_frame padding — you manage capacity/mask yourself,
    # exactly like handing raw pointers to a non-owning PointCloud.
    n = (raw_t.shape[0] // 256) * 256  # any static size works; lane-aligned is fastest
    target = Frame(points=jnp.asarray(raw_t[:n]), mask=jnp.ones((n,), bool))
    m = (raw_s.shape[0] // 256) * 256
    source = Frame(points=jnp.asarray(raw_s[:m]), mask=jnp.ones((m,), bool))

    def align(target, source, max_corr_dist=2.0):
        graph = FactorGraph(num_poses=2)
        graph.add(PriorFactor(prior=jnp.eye(4), weights=jnp.full((6,), 1e6), key=0))
        graph.add(make_icp_factor(0, 1, target, source, max_corr_dist=max_corr_dist))
        poses0 = jnp.stack([jnp.eye(4), jnp.eye(4)])
        return jax.jit(lambda p: optimize_lm(graph, p))(poses0)

    res = align(target, source)
    xi = se3.se3_log(res.poses[1])
    print(f"[raw-array frame]   rot {jnp.linalg.norm(xi[:3]):.4f} rad  trans {jnp.linalg.norm(xi[3:]):.3f} m  err {float(res.error):.1f}")

    # --- 2. "Custom container": a voxel map consumed as a frame -------------
    # GaussianVoxelMap.as_frame() exposes voxel means as points (+ mask over
    # occupied slots); the identical ICP factor matches against it unchanged.
    tgt_frame = make_frame(raw_t)
    vmap = jax.jit(lambda f: build_voxelmap(f, 0.5))(tgt_frame)
    src_small = voxelgrid_sampling(make_frame(raw_s), 0.5, capacity=16384)
    res2 = align(vmap.as_frame(), src_small)
    xi2 = se3.se3_log(res2.poses[1])
    print(f"[voxelmap-as-frame] rot {jnp.linalg.norm(xi2[:3]):.4f} rad  trans {jnp.linalg.norm(xi2[3:]):.3f} m  err {float(res2.error):.1f}")

    # Both containers go through the same factor code path — the pytree
    # duck-typing replaces the reference's traits<> specialization.


if __name__ == "__main__":
    main()
