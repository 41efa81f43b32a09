"""Cart-pole with a wall: hydroelastic-style contact through iLQR.

Task parity with reference cart_pole_with_wall.py: a compliant ball on
the pole tip and a rigid wall at x=-0.5 (cart_pole_with_wall.py:58-104);
T=1.0, dt=1e-2, x0=[0, pi+0.5, 0, 0], x_nom=[0, pi, 0, 0],
Q=diag([0.1,1,0.01,0.01]), R=0.001, Qf=diag([200,200,10,10]), beta=0.5,
contact params dissipation=0, modulus=2e6 (lines 22-52,148).

The optimizer discovers the contact sequence (bounce off the wall) on
its own — the contact-implicit trajectory optimization headline of the
reference paper.

The plant here is built with the multibody engine (not the analytic
cart-pole) because contact needs body kinematics.  The pole-angle sign
convention is chosen so that at theta = pi + 0.5 the tip leans toward
the wall at x=-0.5 (tip x = +0.5 sin theta): the pole topples into the
wall, and the optimizer can exploit the bounce to recover upright — the
behavior shown in the reference's demo.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from drake_ddp_tpu.contact.geometry import (
    BOX,
    HALFSPACE,
    SPHERE,
    CollisionGeometry,
    ContactProps,
    GeometrySet,
    build_contact_model,
)
from drake_ddp_tpu.multibody.model import PRISMATIC, REVOLUTE, ModelBuilder
from drake_ddp_tpu.multibody.plant import make_multibody_system
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator
from drake_ddp_tpu.solver.keypoints import DerivsInterpolation


@dataclasses.dataclass(frozen=True)
class Config:
    T: float = 1.0
    dt: float = 1e-2
    beta: float = 0.5
    # contact model parameters (cart_pole_with_wall.py:46-49)
    dissipation: float = 0.0
    hydroelastic_modulus: float = 2e6
    resolution_hint: float = 0.05
    ball_radius: float = 0.05
    # wall (cart_pole_with_wall.py:79-86): box(0.1,1,2) at x=-0.5
    wall_x: float = -0.5
    use_derivative_interpolation: bool = False
    keypoint_method: str = "setInterval"
    minN: int = 1
    maxN: int = 100
    jerk_threshold: float = 0.0007
    # static keypoint budget: enables sparse (lazy) Jacobian evaluation
    # for iterativeError; None = dense parity fallback (adaptiveJerk and
    # setInterval derive sufficient budgets automatically).
    max_keypoints: Optional[int] = None
    iterative_error_threshold: float = 5e-5
    contact_iters: int = 2
    # Contact tasks are multi-modal (local optima here span costs
    # 25..1100); one vmapped multi-start solve finds the wall-bounce
    # basin reliably (the reference's commented-out random guess,
    # cart_pole_with_wall.py:157-158, gambles on one draw).
    num_starts: int = 8
    guess_scale: float = 10.0
    seed: int = 0
    verbose: bool = True


def build_system(cfg: Config):
    # Drake cart_pole.sdf parameters: cart 10 kg, pole point mass 1 kg at
    # 0.5 m; +Y rotation axis, theta=0 hanging down.
    mb = ModelBuilder()
    cart = mb.add_body("cart", -1, PRISMATIC, axis=(1, 0, 0),
                       mass=10.0, actuated=True)
    pole = mb.add_body("pole", cart, REVOLUTE, axis=(0, -1, 0),
                       mass=1.0, com=(0, 0, -0.5))
    model = mb.finalize()

    props = ContactProps(
        modulus=cfg.hydroelastic_modulus,
        dissipation=cfg.dissipation,
        mu_static=1.0, mu_dynamic=1.0,  # CoulombFriction() default (1.0)
        resolution_hint=cfg.resolution_hint,
    )
    gs = GeometrySet()
    # compliant ball at the pole tip (the reference attaches it at the
    # Pole body frame, which sits at the point mass)
    gs.add(CollisionGeometry(pole, SPHERE, np.array([0.0, 0.0, -0.5]),
                             np.eye(3), np.array([cfg.ball_radius]), props))
    # rigid wall: box l,w,h = 0.1,1,2 at x=-0.5
    wall_props = ContactProps(
        modulus=np.inf, dissipation=cfg.dissipation,
        mu_static=1.0, mu_dynamic=1.0,
    )
    gs.add(CollisionGeometry(-1, BOX, np.array([cfg.wall_x, 0.0, 0.0]),
                             np.eye(3), np.array([0.05, 0.5, 1.0]),
                             wall_props))
    cm = build_contact_model(gs)
    return make_multibody_system(model, cm, cfg.dt,
                                 contact_iters=cfg.contact_iters)


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
    ilqr.SetInitialState(np.array([0.0, np.pi + 0.5, 0.0, 0.0]))
    ilqr.SetTargetState(np.array([0.0, np.pi, 0.0, 0.0]))
    ilqr.SetRunningCost(cfg.dt * np.diag([0.1, 1.0, 0.01, 0.01]),
                        cfg.dt * 0.001 * np.eye(1))
    ilqr.SetTerminalCost(np.diag([200.0, 200.0, 10.0, 10.0]))
    ilqr.SetInitialGuess(np.zeros((1, num_steps - 1)))
    return ilqr


def solve_multistart(cfg: Config = Config()):
    """Batched multi-start solve; returns (MultistartResult, system)."""
    import jax
    import jax.numpy as jnp

    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem
    from drake_ddp_tpu.solver.multistart import multistart_ilqr

    system = build_system(cfg)
    N = int(cfg.T / cfg.dt)
    dt = cfg.dt
    prob = ILQRProblem(
        x0=jnp.asarray([0.0, np.pi + 0.5, 0.0, 0.0], jnp.float32),
        x_nom=jnp.asarray([0.0, np.pi, 0.0, 0.0], jnp.float32),
        Q=jnp.asarray(dt * np.diag([0.1, 1.0, 0.01, 0.01]), jnp.float32),
        R=jnp.asarray(dt * 0.001 * np.eye(1), jnp.float32),
        Qf=jnp.asarray(np.diag([200.0, 200.0, 10.0, 10.0]), jnp.float32),
        u_init=jnp.zeros((N - 1, 1), jnp.float32),
    )
    scfg = ILQRConfig(num_steps=N, beta=cfg.beta, max_iters=60)
    res = jax.jit(
        lambda p: multistart_ilqr(system, scfg, p, cfg.num_starts,
                                  jax.random.PRNGKey(cfg.seed),
                                  cfg.guess_scale)
    )(prob)
    return res, system


def run(cfg: Config = Config()):
    import time

    st = time.time()
    res, _ = solve_multistart(cfg)
    solve_time = time.time() - st
    optimal_cost = float(res.best.cost)
    states = np.asarray(res.best.x).T   # reference (n, N) layout
    inputs = np.asarray(res.best.u).T
    if cfg.verbose:
        print(f"multi-start costs: {np.round(np.asarray(res.costs), 2)}")
    print(f"Solved in {solve_time} seconds using iLQR")
    print(f"Optimal cost: {optimal_cost}")
    return states, inputs, solve_time, optimal_cost


if __name__ == "__main__":
    run()
