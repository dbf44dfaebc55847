from gtsam_points_tpu.pipelines.odometry import (
    OdometryState,
    init_odometry,
    make_odometry_stepper,
    odometry_step,
    frame_to_frame_step,
)
