from gtsam_points_tpu.registration.alignment import align_points_se3, align_points_4dof
from gtsam_points_tpu.registration.fpfh import estimate_fpfh, FPFH_DIM
from gtsam_points_tpu.registration.ransac import estimate_pose_ransac, RANSACParams
from gtsam_points_tpu.registration.gnc import estimate_pose_gnc, GNCParams
from gtsam_points_tpu.registration.cluster import (
    DEFAULT_CLUSTER_CAPACITY,
    DEFAULT_CLUSTER_LEAF,
    DEFAULT_CLUSTER_STAGES,
    QUALITY_CLUSTER_STAGES,
    SourceClusters,
    cluster_source,
    insert_clusters_incremental,
    register_clusters_pyramid,
)
from gtsam_points_tpu.registration.pyramid import (
    DEFAULT_STAGES,
    PyramidStage,
    QUALITY_STAGES,
    build_pyramid,
    register_pair_pyramid,
    register_scan_pyramid,
)
