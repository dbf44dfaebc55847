from gtsam_points_tpu.types.frame import Frame, make_frame, transform_frame, merge_frames
