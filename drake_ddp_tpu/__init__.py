"""drake_ddp_tpu: TPU-native contact-implicit trajectory optimization.

A from-scratch JAX/XLA framework with the capabilities of the reference
``vincekurtz/drake_ddp`` repo (iLQR through smooth hydroelastic contact,
keypoint derivative interpolation, receding-horizon MPC, 7 example tasks),
re-architected TPU-first:

- dynamics are pure functions ``step(params, x, u) -> x_next`` (no Context
  objects; replaces the Drake systems framework, reference ilqr.py:208-231),
- dynamics Jacobians come from batched ``jax.jacfwd`` (replaces Drake's
  AutoDiffXd scalar type, reference ilqr.py:233-272),
- rollouts/linesearch/Riccati recursions are ``lax.scan``/``lax.while_loop``
  programs compiled once by XLA (reference ilqr.py:274-337, 623-667),
- thousands of MPC scenarios batch across chips via ``vmap`` + ``shard_map``
  over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRProblem,
    ILQRSolution,
    solve_ilqr,
)
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator
from drake_ddp_tpu.solver.keypoints import DerivsInterpolation
from drake_ddp_tpu.solver.transcription import (
    TranscriptionConfig,
    solve_transcription,
)
from drake_ddp_tpu.mpc.driver import (MPCConfig, mpc_solve,
                                      mpc_solve_batched)
from drake_ddp_tpu.solver.batched import solve_ilqr_batched
from drake_ddp_tpu.parallel import batched_mpc, batched_solve, scenario_mesh

__all__ = [
    "DiscreteSystem",
    "ILQRConfig",
    "ILQRProblem",
    "ILQRSolution",
    "solve_ilqr",
    "IterativeLinearQuadraticRegulator",
    "DerivsInterpolation",
    "TranscriptionConfig",
    "solve_transcription",
    "MPCConfig",
    "mpc_solve",
    "batched_mpc",
    "batched_solve",
    "solve_ilqr_batched",
    "mpc_solve_batched",
    "scenario_mesh",
]
