"""Optimizers: fused linearize-all factor graph + LM / GN / Dogleg /
gradient descent, incremental (ISAM2-style, fixed-lag) APIs, and linear
solvers (reference: include/gtsam_points/optimizers/)."""

from gtsam_points_tpu.optim.graph import FactorGraph, retract
from gtsam_points_tpu.optim.lm import (
    GNResult,
    LMParams,
    LMResult,
    LMStatus,
    optimize_gn,
    optimize_lm,
)
from gtsam_points_tpu.optim.dogleg import (
    DoglegParams,
    DoglegResult,
    gradient_descent,
    optimize_dogleg,
)
from gtsam_points_tpu.optim.isam2 import ISAM2Ext, ISAM2ExtDummy, ISAM2ResultExt
from gtsam_points_tpu.optim.incremental import (
    FixedLagSmoother,
    MarginalPriorFactor,
    make_marginal_prior,
    marginalize_system,
)
from gtsam_points_tpu.optim.solvers import (
    block_jacobi_preconditioner,
    cg_solve,
    schur_pose_landmark,
)
from gtsam_points_tpu.optim.sparse import (
    PoseGraphEdges,
    PoseGraphResult,
    SparseSystem,
    linearize_pose_graph,
    make_pose_graph,
    optimize_pose_graph,
    pose_graph_error,
    solve_cg_block,
    sparse_matvec,
)

__all__ = [
    "FactorGraph",
    "retract",
    "LMParams",
    "LMResult",
    "LMStatus",
    "GNResult",
    "optimize_lm",
    "optimize_gn",
    "DoglegParams",
    "DoglegResult",
    "optimize_dogleg",
    "gradient_descent",
    "ISAM2Ext",
    "ISAM2ExtDummy",
    "ISAM2ResultExt",
    "FixedLagSmoother",
    "MarginalPriorFactor",
    "make_marginal_prior",
    "marginalize_system",
    "block_jacobi_preconditioner",
    "cg_solve",
    "schur_pose_landmark",
    "PoseGraphEdges",
    "PoseGraphResult",
    "SparseSystem",
    "make_pose_graph",
    "linearize_pose_graph",
    "pose_graph_error",
    "sparse_matvec",
    "solve_cg_block",
    "optimize_pose_graph",
]
