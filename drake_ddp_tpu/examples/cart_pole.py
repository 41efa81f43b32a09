"""Cart-pole swing-up.

Task parity with reference cart_pole.py: T=2.0, dt=0.01, x0=[0,0,0,0],
x_nom=[0,pi,0,0], Q=diag([10,10,0.1,0.1]), R=0.001*I,
Qf=diag([100,100,10,10]), beta=0.9 (cart_pole.py:21-49,108); all three
keypoint derivative-interpolation methods available via config
(cart_pole.py:25-30).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from drake_ddp_tpu.dynamics.analytic import cart_pole_system
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator
from drake_ddp_tpu.solver.keypoints import DerivsInterpolation


@dataclasses.dataclass(frozen=True)
class Config:
    T: float = 2.0
    dt: float = 1e-2
    beta: float = 0.9
    # "ilqr" or "sqp" (direct transcription; reference cart_pole.py:23)
    method: str = "ilqr"
    # derivative interpolation (cart_pole.py:25-30)
    use_derivative_interpolation: bool = False
    keypoint_method: str = "adaptiveJerk"
    minN: int = 5
    maxN: int = 10
    jerk_threshold: float = 1e-4
    # static keypoint budget: enables sparse (lazy) Jacobian evaluation
    # for iterativeError; None = dense parity fallback (adaptiveJerk and
    # setInterval derive sufficient budgets automatically).
    max_keypoints: Optional[int] = None
    iterative_error_threshold: float = 5e-5
    verbose: bool = True


def build_system(cfg: Config):
    return cart_pole_system(dt=cfg.dt)


def build_solver(cfg: Config):
    system = build_system(cfg)
    num_steps = int(cfg.T / cfg.dt)
    interp: Optional[DerivsInterpolation] = None
    if cfg.use_derivative_interpolation:
        interp = DerivsInterpolation(
            cfg.keypoint_method, cfg.minN, cfg.maxN,
            cfg.jerk_threshold, cfg.iterative_error_threshold,
            max_keypoints=cfg.max_keypoints,
        )
    ilqr = IterativeLinearQuadraticRegulator(
        system, num_steps, beta=cfg.beta,
        derivs_keypoint_method=interp, verbose=cfg.verbose,
    )
    ilqr.SetInitialState(np.zeros(4))
    ilqr.SetTargetState(np.array([0.0, np.pi, 0.0, 0.0]))
    ilqr.SetRunningCost(cfg.dt * np.diag([10.0, 10.0, 0.1, 0.1]),
                        cfg.dt * 0.001 * np.eye(1))
    ilqr.SetTerminalCost(np.diag([100.0, 100.0, 10.0, 10.0]))
    ilqr.SetInitialGuess(np.zeros((1, num_steps - 1)))
    return ilqr


def run(cfg: Config = Config()):
    ilqr = build_solver(cfg)
    if cfg.method == "sqp":
        states, inputs, solve_time, optimal_cost = \
            ilqr.SolveDirectTranscription()
    else:
        states, inputs, solve_time, optimal_cost = ilqr.Solve()
    print(f"Solved in {solve_time} seconds using {cfg.method}")
    print(f"Optimal cost: {optimal_cost}")
    return states, inputs, solve_time, optimal_cost


if __name__ == "__main__":
    run()
