"""Direct-transcription baseline (SURVEY.md D6): must reach a cost
comparable to iLQR on the same problem (the reference's cross-solver
check, README.md:35)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_ddp_tpu.dynamics.analytic import pendulum_system
from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, solve_ilqr
from drake_ddp_tpu.solver.transcription import (
    TranscriptionConfig,
    solve_transcription,
)


def _pendulum_problem(N, dtype=jnp.float32):
    dt = 1e-2
    return pendulum_system(dt=dt), ILQRProblem(
        x0=jnp.zeros(2, dtype),
        x_nom=jnp.array([np.pi, 0.0], dtype),
        Q=jnp.asarray(dt * 0.01 * np.diag([0, 1.0]), dtype),
        R=jnp.asarray(dt * 0.01 * np.eye(1), dtype),
        Qf=jnp.asarray(100 * np.eye(2), dtype),
        u_init=jnp.zeros((N - 1, 1), dtype),
    )


def test_transcription_vs_ilqr_pendulum():
    N = 100
    sys, prob = _pendulum_problem(N)
    ilqr_sol = jax.jit(lambda p: solve_ilqr(
        sys, ILQRConfig(num_steps=N, max_iters=40), p))(prob)
    tr_sol = jax.jit(lambda p: solve_transcription(
        sys, TranscriptionConfig(num_steps=N, num_rounds=5,
                                 inner_steps=500), p))(prob)
    assert float(tr_sol.defect) < 1e-2
    # swing-up reached (transcribed states, the reference's
    # GetStateSamples contract); costs in the same ballpark
    assert abs(float(tr_sol.x[-1, 0]) - np.pi) < 0.3
    assert float(tr_sol.cost) < 5.0 * max(float(ilqr_sol.cost), 1.0)


def test_transcription_batchable():
    N = 40
    sys, prob = _pendulum_problem(N)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), prob)
    sols = jax.jit(jax.vmap(lambda p: solve_transcription(
        sys, TranscriptionConfig(num_steps=N, num_rounds=2,
                                 inner_steps=100), p)))(batch)
    assert sols.cost.shape == (2,)
    assert np.allclose(np.asarray(sols.cost[0]), np.asarray(sols.cost[1]),
                       rtol=1e-3)
