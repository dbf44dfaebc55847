from gtsam_points_tpu.optim.graph import FactorGraph
from gtsam_points_tpu.optim.lm import LMParams, optimize_lm
