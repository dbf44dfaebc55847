"""B-spline continuous trajectory on the real data/continuous recording
(reference: src/demo/demo_continuous_trajectory.cpp): fit a 0.1 s-knot spline
to 238 s of poses with the O(K) banded Gauss-Newton fit, then predict IMU
measurements along it and compare against the recorded IMU.

Run: python examples/demo_continuous_trajectory.py [--platform cpu]
"""

import time

from _common import DATA, setup


def main():
    setup(__doc__)
    import jax.numpy as jnp
    import numpy as np

    from gtsam_points_tpu.utils import se3
    from gtsam_points_tpu.utils.bspline import fit_knots

    traj = np.loadtxt(f"{DATA}/continuous/traj.txt")
    imu = np.loadtxt(f"{DATA}/continuous/imu.txt")
    t_origin = traj[0, 0]
    stamps = (traj[:, 0] - t_origin).astype(np.float32)
    poses = np.asarray(se3.pose_from_xyzq(jnp.asarray(traj[:, 1:].astype(np.float32))))

    t0 = time.perf_counter()
    tr = fit_knots(jnp.asarray(stamps), jnp.asarray(poses),
                   t0=float(stamps[0]), t1=float(stamps[-1]), knot_interval=0.1)
    pred = tr.pose(jnp.asarray(stamps))
    rot_e, trans_e = se3.pose_error(jnp.asarray(poses), pred)
    dt = time.perf_counter() - t0
    print(f"fit {tr.knots.shape[0]} knots to {len(stamps)} poses in {dt:.2f} s "
          f"(banded GN): max rot {float(jnp.max(rot_e)):.2e} rad, "
          f"max trans {float(jnp.max(trans_e)):.2e} m")

    imu_stamps = (imu[:, 0] - t_origin).astype(np.float32)
    inside = (imu_stamps > stamps[0]) & (imu_stamps < stamps[-1])
    acc, gyro = tr.imu(jnp.asarray(imu_stamps[inside]))
    gt = imu[inside, 1:]
    acc_err = np.abs(np.asarray(acc) - gt[:, :3])
    gyro_err = np.abs(np.asarray(gyro) - gt[:, 3:])
    print(f"IMU prediction vs {inside.sum()} measurements: "
          f"acc err p50 {np.median(acc_err):.3f} p99 {np.quantile(acc_err, 0.99):.3f} m/s^2, "
          f"gyro err p50 {np.median(gyro_err):.4f} p99 {np.quantile(gyro_err, 0.99):.4f} rad/s")


if __name__ == "__main__":
    main()
