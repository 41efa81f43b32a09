"""Drop-in style class API mirroring the reference solver's surface.

Wraps the functional core (``solve_ilqr``) in a class with the same method
names, array layouts, and printed iteration table as the reference
``IterativeLinearQuadraticRegulator`` (reference ilqr.py:12-733), so a
user of the reference can switch with minimal edits:

    ilqr = IterativeLinearQuadraticRegulator(system, num_steps, beta=0.5)
    ilqr.SetInitialState(x0); ilqr.SetTargetState(x_nom)
    ilqr.SetRunningCost(dt*Q, dt*R); ilqr.SetTerminalCost(Qf)
    ilqr.SetInitialGuess(u_guess)
    states, inputs, solve_time, optimal_cost = ilqr.Solve()

Differences from the reference (all deliberate, TPU-driven):
- ``system`` is a :class:`DiscreteSystem` (pure step function), not a
  Drake System; there is no input_port_index (the step signature already
  isolates the control input).
- arrays may be numpy or JAX; outputs are numpy in the reference's
  (n, N) / (m, N-1) layouts.
- a failed linesearch raises RuntimeError *after* the compiled solve
  (matching reference ilqr.py:337) unless ``raise_on_divergence=False``.
- per-phase wall-clock timing is not measured inside the fused kernel;
  the iteration table reports cost/eps/linesearch/derivative-percentage
  per iteration plus total solve time (reference table, ilqr.py:685-704).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.solver import keypoints as kp
from drake_ddp_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRProblem,
    ILQRSolution,
    solve_ilqr,
)


class IterativeLinearQuadraticRegulator:
    """Set up and solve min_u sum (x-x_nom)'Q(x-x_nom) + u'Ru + terminal,
    s.t. x_{t+1} = f(x_t, u_t), via iLQR (reference ilqr.py:13-19)."""

    def __init__(
        self,
        system: DiscreteSystem,
        num_timesteps: int,
        delta: float = 1e-2,
        beta: float = 0.95,
        gamma: float = 0.0,
        derivs_keypoint_method: Optional[kp.DerivsInterpolation] = None,
        max_iters: int = 100,
        reg: Optional[float] = None,
        verbose: bool = True,
        raise_on_divergence: bool = True,
        parallel_backward: bool = False,
        dtype=None,
    ):
        self.system = system
        self.N = int(num_timesteps)
        self.n = system.n
        self.m = system.m
        derivs = (derivs_keypoint_method or kp.BASELINE).validate()
        self.config = ILQRConfig(
            num_steps=self.N,
            delta=float(delta),
            beta=float(beta),
            gamma=float(gamma),
            max_iters=int(max_iters),
            # None -> ILQRConfig's adaptive-regularization default
            **({} if reg is None else dict(reg=float(reg))),
            derivs=derivs,
            # associative-scan Riccati (solver/parscan.py): O(log N)
            # depth instead of a sequential reverse scan — wins on long
            # horizons (acrobot N=750), slightly slower on short ones
            parallel_backward=bool(parallel_backward),
        )
        self.dtype = dtype or jnp.float32
        self.verbose = verbose
        self.raise_on_divergence = raise_on_divergence

        # Problem data, defaults as in the reference (ilqr.py:61-71).
        self.x0 = np.zeros(self.n)
        self.x_nom = np.zeros(self.n)
        self.Q = np.eye(self.n)
        self.R = np.eye(self.m)
        self.Qf = np.eye(self.n)
        self.u_guess = np.zeros((self.m, self.N - 1))

        self._solution: Optional[ILQRSolution] = None
        # Params are closed over (they may be an arbitrary host object);
        # the problem pytree is the only dynamic argument, so MPC resolves
        # with new x0/x_nom/u_init reuse the compiled executable.
        self._solve_fn = jax.jit(lambda prob: solve_ilqr(system, self.config, prob))

    # -- problem definition API (reference ilqr.py:102-159) ------------

    def SetInitialState(self, x0):
        self.x0 = np.asarray(x0).reshape(self.n)

    def SetTargetState(self, x_nom):
        self.x_nom = np.asarray(x_nom).reshape(self.n)

    def SetRunningCost(self, Q, R):
        Q, R = np.asarray(Q), np.asarray(R)
        assert Q.shape == (self.n, self.n)
        assert R.shape == (self.m, self.m)
        self.Q, self.R = Q, R

    def SetTerminalCost(self, Qf):
        Qf = np.asarray(Qf)
        assert Qf.shape == (self.n, self.n)
        self.Qf = Qf

    def SetInitialGuess(self, u_guess):
        u_guess = np.asarray(u_guess)
        assert u_guess.shape == (self.m, self.N - 1)
        self.u_guess = u_guess

    def SetControlLimits(self, u_min, u_max):
        # Reference is an explicit no-op stub (ilqr.py:158-159).
        pass

    # -- solve ----------------------------------------------------------

    def _problem(self, dtype=None) -> ILQRProblem:
        dtype = dtype or self.dtype
        return ILQRProblem(
            x0=jnp.asarray(self.x0, dtype),
            x_nom=jnp.asarray(self.x_nom, dtype),
            Q=jnp.asarray(self.Q, dtype),
            R=jnp.asarray(self.R, dtype),
            Qf=jnp.asarray(self.Qf, dtype),
            u_init=jnp.asarray(self.u_guess.T, dtype),  # to time-major
        )

    def Solve(self):
        """Solve and return (x (n,N), u (m,N-1), solve_time, optimal_cost)
        — same contract as reference Solve() (ilqr.py:669-710)."""
        st = time.time()
        sol = self._solve_fn(self._problem())
        sol = jax.tree_util.tree_map(np.asarray, jax.device_get(sol))
        solve_time = time.time() - st
        self._solution = sol

        if self.verbose:
            self._print_table(sol, solve_time)

        if sol.diverged and self.raise_on_divergence:
            raise RuntimeError(
                "linesearch failed (eps < %g)" % self.config.eps_min
            )
        return sol.x.T, sol.u.T, solve_time, float(sol.cost)

    def _print_table(self, sol: ILQRSolution, solve_time: float):
        bar = "-" * 80
        print(bar)
        print("|    iter    |    cost    |    eps    |    ls    | derivs '%' |")
        print(bar)
        for i in range(int(sol.iterations)):
            print(
                f"{i + 1:^14}{sol.stats.cost[i]:11.4f}  "
                f"{sol.stats.eps[i]:^12.4f}{int(sol.stats.ls_iters[i]):^11}"
                f"   {sol.stats.percent_derivs[i]:.1f}"
            )
        print(f"total solve time: {solve_time:.4f} s")

    def SolveProfiled(self):
        """Solve with per-phase device timing — the reference's
        time_fp / time_getDerivs / time_bp columns (ilqr.py:685-704),
        which the fused production solve cannot measure.  Slower than
        Solve() (host-stepped, one device call per phase); use to answer
        "where does the iteration go".  Returns the Solve() contract
        plus the PhaseTimes record."""
        from drake_ddp_tpu.solver.profile import (
            format_phase_table,
            profiled_solve,
        )

        st = time.time()
        sol, times = profiled_solve(self.system, self.config,
                                    self._problem())
        sol = jax.tree_util.tree_map(np.asarray, jax.device_get(sol))
        solve_time = time.time() - st
        self._solution = sol
        if self.verbose:
            print(format_phase_table(sol, times))
            print(f"total solve time: {solve_time:.4f} s")
        if sol.diverged and self.raise_on_divergence:
            raise RuntimeError(
                "linesearch failed (eps < %g)" % self.config.eps_min
            )
        return sol.x.T, sol.u.T, solve_time, float(sol.cost), times

    # -- persistence (reference ilqr.py:712-733) -------------------------

    def SolveDirectTranscription(self, tcfg=None):
        """Solve the same problem with the direct-transcription baseline
        (the reference's SQP comparison path, pendulum.py:109-141) and
        return the same (x, u, solve_time, cost) contract."""
        from drake_ddp_tpu.solver.transcription import (
            TranscriptionConfig,
            solve_transcription,
        )

        tcfg = tcfg or TranscriptionConfig(num_steps=self.N)
        st = time.time()
        sol = jax.jit(
            lambda p: solve_transcription(self.system, tcfg, p)
        )(self._problem())
        sol = jax.tree_util.tree_map(np.asarray, jax.device_get(sol))
        solve_time = time.time() - st
        if self.verbose:
            print(f"transcription defect: {float(sol.defect):.2e}, "
                  f"objective: {float(sol.objective):.4f}")
        return sol.x.T, sol.u.T, solve_time, float(sol.cost)

    def SaveSolution(self, fname: str):
        """Save (t, x_bar, u_bar, K) to .npz; the feedback law
        u = u_bar - K (x - x_bar) stabilizes the trajectory."""
        if self._solution is None:
            raise RuntimeError("call Solve() before SaveSolution()")
        dt = self.system.dt
        T = (self.N - 1) * dt
        t = np.arange(0.0, T, dt)
        sol = self._solution
        np.savez(
            fname,
            t=t,
            x_bar=sol.x.T[:, :-1],  # (n, N-1): last step dropped, as ref
            u_bar=sol.u.T,          # (m, N-1)
            K=np.moveaxis(sol.K, 0, -1),  # (m, n, N-1)
        )
