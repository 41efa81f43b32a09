from drake_ddp_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRProblem,
    ILQRSolution,
    solve_ilqr,
)
from drake_ddp_tpu.solver.keypoints import DerivsInterpolation
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator

__all__ = [
    "ILQRConfig",
    "ILQRProblem",
    "ILQRSolution",
    "solve_ilqr",
    "DerivsInterpolation",
    "IterativeLinearQuadraticRegulator",
]
