"""Solver tests: LQR sanity, optimality conditions, parity with the
float64 NumPy spec mirror, and end-to-end pendulum swing-up
(SURVEY.md §4 layers (c)/(d))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.dynamics.analytic import pendulum_system, cart_pole_system
from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, solve_ilqr
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator

from np_spec_mirror import solve_ilqr_np


def linear_system(dt=0.1):
    """Double integrator."""
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.0], [dt]])

    def step(params, x, u):
        A, B = params
        return A @ x + B @ u

    return DiscreteSystem(step_fn=step, params=(A, B), n=2, m=1, dt=dt)


def test_lqr_converges_fast_and_stationary():
    sys = linear_system()
    N = 30
    cfg = ILQRConfig(num_steps=N, delta=1e-4, max_iters=20)
    prob = ILQRProblem(
        x0=jnp.array([1.0, 0.0]),
        x_nom=jnp.zeros(2),
        Q=0.1 * jnp.eye(2),
        R=0.01 * jnp.eye(1),
        Qf=10.0 * jnp.eye(2),
        u_init=jnp.zeros((N - 1, 1)),
    )
    sol = jax.jit(lambda p: solve_ilqr(sys, cfg, p))(prob)
    assert not bool(sol.diverged)
    # Linear dynamics + quadratic cost: 2-3 outer iterations.
    assert int(sol.iterations) <= 4

    # Stationarity: gradient of the total cost w.r.t. the control tape
    # vanishes at the solution (non-circular optimality check).
    def total_cost(u_tape):
        x = sys.rollout(prob.x0, u_tape)
        dx = x[:-1] - prob.x_nom
        run = jnp.einsum("ti,ij,tj->", dx, prob.Q, dx) + jnp.einsum(
            "ti,ij,tj->", u_tape, prob.R, u_tape
        )
        dxf = x[-1] - prob.x_nom
        return run + dxf @ prob.Qf @ dxf

    g = jax.grad(total_cost)(sol.u)
    assert float(jnp.max(jnp.abs(g))) < 1e-4


def test_pendulum_swingup_matches_spec_mirror():
    """Golden parity: same cost trajectory as the float64 NumPy mirror of
    the reference algorithm, within 1% (BASELINE.md criterion)."""
    dt = 1e-2
    N = 200
    sys = pendulum_system(dt=dt)
    Q = dt * 0.01 * np.diag([0.0, 1.0])
    R = dt * 0.01 * np.eye(1)
    Qf = 100 * np.eye(2)
    x0 = np.zeros(2)
    x_nom = np.array([np.pi, 0.0])

    cfg = ILQRConfig(num_steps=N, delta=1e-2, beta=0.95, max_iters=100)
    prob = ILQRProblem(
        x0=jnp.asarray(x0, jnp.float32),
        x_nom=jnp.asarray(x_nom, jnp.float32),
        Q=jnp.asarray(Q, jnp.float32),
        R=jnp.asarray(R, jnp.float32),
        Qf=jnp.asarray(Qf, jnp.float32),
        u_init=jnp.zeros((N - 1, 1), jnp.float32),
    )
    sol = jax.jit(lambda p: solve_ilqr(sys, cfg, p))(prob)
    assert not bool(sol.diverged)

    # NumPy float64 mirror with the same dynamics
    f_jit = jax.jit(sys.bound_step())

    def step_np(x, u):
        return np.asarray(f_jit(jnp.asarray(x, jnp.float64), jnp.asarray(u, jnp.float64)))

    x_np, u_np, L_np, hist = solve_ilqr_np(
        step_np, N, x0, x_nom, Q, R, Qf, np.zeros((N - 1, 1)),
        delta=1e-2, beta=0.95,
    )

    # final cost parity within 1%
    assert abs(float(sol.cost) - L_np) / L_np < 0.01
    # swing-up achieved
    assert abs(float(sol.x[-1, 0]) - np.pi) < 0.1
    # similar iteration count (parity criterion: iters-to-converge)
    assert abs(int(sol.iterations) - len(hist)) <= 2


def test_class_api_pendulum():
    dt = 1e-2
    N = 200
    sys = pendulum_system(dt=dt)
    ilqr = IterativeLinearQuadraticRegulator(sys, N, verbose=False)
    ilqr.SetInitialState(np.zeros(2))
    ilqr.SetTargetState(np.array([np.pi, 0.0]))
    ilqr.SetRunningCost(dt * 0.01 * np.diag([0, 1.0]), dt * 0.01 * np.eye(1))
    ilqr.SetTerminalCost(100 * np.eye(2))
    ilqr.SetInitialGuess(np.zeros((1, N - 1)))
    states, inputs, solve_time, cost = ilqr.Solve()
    assert states.shape == (2, N)
    assert inputs.shape == (1, N - 1)
    assert abs(states[0, -1] - np.pi) < 0.1
    assert cost < 10.0


def test_save_solution_roundtrip(tmp_path):
    dt = 1e-2
    N = 50
    sys = pendulum_system(dt=dt)
    ilqr = IterativeLinearQuadraticRegulator(sys, N, verbose=False)
    ilqr.SetTargetState(np.array([np.pi, 0.0]))
    ilqr.SetRunningCost(dt * 0.01 * np.diag([0, 1.0]), dt * 0.01 * np.eye(1))
    ilqr.SetTerminalCost(100 * np.eye(2))
    ilqr.Solve()
    fname = str(tmp_path / "sol.npz")
    ilqr.SaveSolution(fname)
    data = np.load(fname)
    assert data["x_bar"].shape == (2, N - 1)
    assert data["u_bar"].shape == (1, N - 1)
    assert data["K"].shape == (1, 2, N - 1)
    assert data["t"].shape[0] == N - 1


def test_vmapped_batch_solve():
    """Scenario batching: vmap the whole solver over perturbed x0."""
    sys = linear_system()
    N = 20
    cfg = ILQRConfig(num_steps=N, delta=1e-4, max_iters=10)
    B = 8
    x0s = jnp.stack([jnp.array([1.0 + 0.1 * i, 0.0]) for i in range(B)])
    prob = ILQRProblem(
        x0=x0s,
        x_nom=jnp.zeros((B, 2)),
        Q=jnp.tile(0.1 * jnp.eye(2), (B, 1, 1)),
        R=jnp.tile(0.01 * jnp.eye(1), (B, 1, 1)),
        Qf=jnp.tile(10.0 * jnp.eye(2), (B, 1, 1)),
        u_init=jnp.zeros((B, N - 1, 1)),
    )
    sol = jax.jit(jax.vmap(lambda p: solve_ilqr(sys, cfg, p)))(prob)
    assert sol.x.shape == (B, N, 2)
    assert not bool(jnp.any(sol.diverged))
    # costs increase monotonically with |x0|
    costs = np.asarray(sol.cost)
    assert np.all(np.diff(costs) > 0)


def test_divergence_masking_not_raising():
    """A scenario with hopeless dynamics must flag, not raise."""

    def step(params, x, u):
        return x * 1e8 + u.sum()  # exploding dynamics

    sys = DiscreteSystem(step_fn=step, params=None, n=2, m=1, dt=0.1)
    N = 10
    cfg = ILQRConfig(num_steps=N, delta=1e-6, max_iters=5, beta=0.5)
    prob = ILQRProblem(
        x0=jnp.ones(2),
        x_nom=jnp.zeros(2),
        Q=jnp.eye(2),
        R=jnp.eye(1),
        Qf=jnp.eye(2),
        u_init=jnp.zeros((N - 1, 1)),
    )
    sol = jax.jit(lambda p: solve_ilqr(sys, cfg, p))(prob)
    assert bool(jnp.isfinite(sol.cost)) or bool(sol.diverged)
