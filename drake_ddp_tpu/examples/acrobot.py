"""Acrobot swing-up, with optional receding-horizon MPC.

Task parity with reference acrobot.py: T=3, dt=0.004, x0=0,
x_nom=[pi,0,0,0], Q=0.01*diag([0,0,1,1]), R=0.01*I, Qf=100*I, beta=0.5
(acrobot.py:19-45,118-120); MPC mode runs 50 resolves at 2-step replans
(acrobot.py:131-162).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from drake_ddp_tpu.dynamics.analytic import acrobot_system
from drake_ddp_tpu.mpc.driver import MPCConfig, mpc_solve
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator
from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem


@dataclasses.dataclass(frozen=True)
class Config:
    T: float = 3.0
    dt: float = 0.004
    beta: float = 0.5
    # "ilqr" or "sqp" (direct transcription; reference acrobot.py:25)
    method: str = "ilqr"
    MPC: bool = False
    num_resolves: int = 50
    replan_steps: int = 2
    max_iters: int = 100
    verbose: bool = True
    # N=750 is the longest horizon in the reference suite — the
    # associative-scan Riccati (solver/parscan.py, O(log N) depth) wins
    # here, while short-horizon tasks keep the sequential sweep
    # (equivalence pinned by tests/test_robot_examples.py)
    parallel_backward: bool = True


def build_system(cfg: Config):
    return acrobot_system(dt=cfg.dt)


def _cost_matrices(cfg: Config):
    Q = cfg.dt * 0.01 * np.diag([0.0, 0.0, 1.0, 1.0])
    R = cfg.dt * 0.01 * np.eye(1)
    Qf = 100.0 * np.eye(4)
    return Q, R, Qf


def run(cfg: Config = Config()):
    import jax.numpy as jnp

    system = build_system(cfg)
    num_steps = int(cfg.T / cfg.dt)
    Q, R, Qf = _cost_matrices(cfg)

    if not cfg.MPC:
        ilqr = IterativeLinearQuadraticRegulator(
            system, num_steps, beta=cfg.beta, verbose=cfg.verbose,
            max_iters=cfg.max_iters,
            parallel_backward=cfg.parallel_backward,
        )
        ilqr.SetInitialState(np.zeros(4))
        ilqr.SetTargetState(np.array([np.pi, 0.0, 0.0, 0.0]))
        ilqr.SetRunningCost(Q, R)
        ilqr.SetTerminalCost(Qf)
        ilqr.SetInitialGuess(np.zeros((1, num_steps - 1)))
        if cfg.method == "sqp":
            states, inputs, solve_time, optimal_cost = \
                ilqr.SolveDirectTranscription()
        else:
            states, inputs, solve_time, optimal_cost = ilqr.Solve()
        print(f"Solved in {solve_time} seconds using {cfg.method}")
        print(f"Optimal cost: {optimal_cost}")
        return states, inputs, solve_time, optimal_cost

    # MPC mode: one compiled scan over resolves.
    solver_cfg = ILQRConfig(
        num_steps=num_steps, beta=cfg.beta, max_iters=cfg.max_iters,
        parallel_backward=cfg.parallel_backward,
    )
    prob = ILQRProblem(
        x0=jnp.zeros(4, jnp.float32),
        x_nom=jnp.array([np.pi, 0, 0, 0], jnp.float32),
        Q=jnp.asarray(Q, jnp.float32),
        R=jnp.asarray(R, jnp.float32),
        Qf=jnp.asarray(Qf, jnp.float32),
        u_init=jnp.zeros((num_steps - 1, 1), jnp.float32),
    )
    mpc = MPCConfig(num_resolves=cfg.num_resolves, replan_steps=cfg.replan_steps)
    import time

    fn = jax.jit(lambda p: mpc_solve(system, solver_cfg, p, mpc))
    st = time.time()
    res = fn(prob)
    costs = np.asarray(res.costs)
    solve_time = time.time() - st
    print(f"Solved {cfg.num_resolves + 1} MPC solves in {solve_time} s")
    print(f"Final cost: {costs[-1]}")
    return np.asarray(res.states).T, np.asarray(res.final_u).T, solve_time, costs


if __name__ == "__main__":
    run()
