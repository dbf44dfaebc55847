from gtsam_points_tpu.parallel.sharding import make_mesh, make_mesh_2d, shard_frame, replicate
from gtsam_points_tpu.parallel.sharded_voxelmap import (
    VGICPShardedFactor,
    build_sharded_voxelmap,
    collective_bytes_per_linearize,
    linearize_vgicp_sharded,
    make_vgicp_sharded_factor,
    place_sharded,
    shard_of_keys,
    sharded_insert_frame,
    sharded_num_voxels,
    sharded_overlap,
)
