from .constants import gauss_constants
from .newton import NewtonConfig, NewtonResult, newton_align
from .objective import NdtObjective, full_hessian, score_grad_hess, score_only
from .svn import SvnConfig, SvnResult, svn_align

__all__ = [
    "gauss_constants",
    "score_only",
    "score_grad_hess",
    "full_hessian",
    "NdtObjective",
    "NewtonConfig",
    "NewtonResult",
    "newton_align",
    "SvnConfig",
    "SvnResult",
    "svn_align",
]
