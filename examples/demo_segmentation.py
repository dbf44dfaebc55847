"""Point-cloud segmentation on a kitti_07 submap (reference:
src/demo/demo_segmentation.cpp — click a seed, extract the object): region
growing and min-cut from a seed point.

Run: python examples/demo_segmentation.py [--platform cpu]
"""

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gtsam_points_tpu.ops.downsample import voxelgrid_sampling
    from gtsam_points_tpu.ops.features import estimate_normals_covs
    from gtsam_points_tpu.segmentation import min_cut, region_growing
    from gtsam_points_tpu.segmentation.min_cut import MinCutParams
    from gtsam_points_tpu.segmentation.region_growing import RegionGrowingParams
    from gtsam_points_tpu.types.frame import make_frame
    from gtsam_points_tpu.utils import io

    pts = io.read_points(f"{DATA}/kitti_07_dump/000000/points.bin")
    frame = voxelgrid_sampling(make_frame(pts, capacity=25088), 0.3, capacity=16384)
    frame = estimate_normals_covs(frame, k=10, grid_leaf=1.0)
    n_valid = int(jnp.sum(frame.mask))

    # seed: a point on the dominant ground plane near the sensor
    p = np.asarray(frame.points)
    m = np.asarray(frame.mask)
    near = m & (np.linalg.norm(p[:, :2], axis=1) < 8.0) & (np.abs(p[:, 2] + 1.5) < 0.5)
    seed = jnp.asarray(p[np.argmax(near)])

    rg = region_growing(
        frame, seed, RegionGrowingParams(distance_thresh=0.6, angle_thresh=0.25)
    )
    print(f"region growing from ground seed: {int(jnp.sum(rg))}/{n_valid} points in cluster")

    mc = min_cut(frame, seed, MinCutParams(foreground_radius=4.0, background_radius=12.0))
    print(f"min-cut around seed: {int(mc.sum())}/{n_valid} foreground points")


if __name__ == "__main__":
    main()
