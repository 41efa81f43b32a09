"""Scenario parallelism over TPU meshes (SURVEY.md §2.4).

The reference is entirely sequential and single-process; on TPU the
scaling axis is data parallelism over *scenarios* (perturbed initial
states, cost weights, warm starts) — thousands of independent iLQR/MPC
solves per compiled call, sharded across chips with
``Mesh`` + ``shard_map`` and reduced with XLA collectives over ICI.
Tensor/pipeline/expert/sequence parallelism are not applicable at these
problem sizes (n <= 37); the long-horizon analog of sequence parallelism
is the associative-scan Riccati pass (solver/parscan.py when present).
"""

from drake_ddp_tpu.parallel import multihost
from drake_ddp_tpu.parallel.sharding import (
    batched_mpc,
    batched_solve,
    scenario_mesh,
    shard_problems,
)

__all__ = [
    "batched_mpc",
    "batched_solve",
    "multihost",
    "scenario_mesh",
    "shard_problems",
]
