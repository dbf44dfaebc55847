"""B-spline pose resampling CLI (reference: src/tools/pose_interpolator.cpp).

Reads a pose file of lines `stamp x y z qx qy qz qw`, fits a continuous-time
B-spline trajectory, and writes poses resampled at the requested rate in the
same format.

Usage: python tools/pose_interpolator.py in.txt out.txt --hz 100 [--knot-interval 0.1] [--platform cpu]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--hz", type=float, default=100.0)
    ap.add_argument("--knot-interval", type=float, default=0.1)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    import gtsam_points_tpu
    from gtsam_points_tpu.utils import se3
    from gtsam_points_tpu.utils.bspline import fit_knots

    rows = np.loadtxt(args.input)
    stamps = rows[:, 0].astype(np.float32)
    poses = np.asarray(se3.pose_from_xyzq(jnp.asarray(rows[:, 1:8].astype(np.float32))))

    t0, t1 = float(stamps[0]), float(stamps[-1])
    traj = fit_knots(jnp.asarray(stamps), jnp.asarray(poses), t0, t1, args.knot_interval)

    ts = np.arange(t0, t1, 1.0 / args.hz, dtype=np.float32)
    T = np.asarray(traj.pose(jnp.asarray(ts)))
    q = np.asarray(se3.rot_to_quat(jnp.asarray(T[:, :3, :3])))
    out = np.concatenate([ts[:, None], T[:, :3, 3], q], axis=1)
    np.savetxt(args.output, out, fmt="%.9f")
    print(f"wrote {len(out)} poses at {args.hz} Hz to {args.output}")


if __name__ == "__main__":
    main()
