from drake_ddp_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRProblem,
    ILQRSolution,
    solve_ilqr,
)
from drake_ddp_tpu.solver.keypoints import DerivsInterpolation
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator
from drake_ddp_tpu.solver.multistart import MultistartResult, multistart_ilqr
from drake_ddp_tpu.solver.transcription import (
    TranscriptionConfig,
    TranscriptionSolution,
    solve_transcription,
)

__all__ = [
    "ILQRConfig",
    "ILQRProblem",
    "ILQRSolution",
    "solve_ilqr",
    "DerivsInterpolation",
    "IterativeLinearQuadraticRegulator",
    "MultistartResult",
    "multistart_ilqr",
    "TranscriptionConfig",
    "TranscriptionSolution",
    "solve_transcription",
]
