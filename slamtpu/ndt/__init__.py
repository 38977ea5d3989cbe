from .constants import gauss_constants
from .gicp import (
    gicp_align,
    gicp_align_aniso,
    gicp_map,
    gicp_map_aniso,
    regularize_plane_covariance,
    score_grad_hess_gicp,
    score_grad_hess_gicp_aniso,
    source_point_covariances,
)
from .pallas_math import (
    gicp_align_fused,
    newton_align_fused,
    newton_align_fused_batch,
    score_grad_hess_fused,
)
from .newton import NewtonConfig, NewtonResult, newton_align, newton_align_reg
from .objective import NdtObjective, full_hessian, score_grad_hess, score_only
from .regmap import (RegMap, build_regmap, build_regmap_kdtree,
    score_grad_hess_reg)
from .svn import SvnConfig, SvnResult, svn_align, svn_align_reg

__all__ = [
    "gauss_constants",
    "score_only",
    "score_grad_hess",
    "full_hessian",
    "NdtObjective",
    "NewtonConfig",
    "NewtonResult",
    "newton_align",
    "newton_align_reg",
    "SvnConfig",
    "SvnResult",
    "svn_align",
    "svn_align_reg",
    "RegMap",
    "build_regmap",
    "build_regmap_kdtree",
    "score_grad_hess_reg",
    "gicp_map",
    "gicp_map_aniso",
    "gicp_align",
    "gicp_align_aniso",
    "regularize_plane_covariance",
    "score_grad_hess_gicp",
    "score_grad_hess_gicp_aniso",
    "source_point_covariances",
    "newton_align_fused",
    "newton_align_fused_batch",
    "gicp_align_fused",
    "score_grad_hess_fused",
]
