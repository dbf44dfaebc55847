from gtsam_points_tpu.factors.linearized import Linearized
from gtsam_points_tpu.factors.icp import ICPFactor, make_icp_factor
from gtsam_points_tpu.factors.gicp import GICPFactor, make_gicp_factor
from gtsam_points_tpu.factors.vgicp import VGICPFactor, make_vgicp_factor
from gtsam_points_tpu.factors.pose_factors import PriorFactor, BetweenFactor, LinearDampingFactor
