from gtsam_points_tpu.utils import se3, io
