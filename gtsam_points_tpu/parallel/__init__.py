from gtsam_points_tpu.parallel.sharding import make_mesh, shard_frame, replicate
