"""Mini Cheetah quadruped: contact-implicit gait generation + MPC.

Task parity with reference mini_cheetah.py: floating-base quadruped
(n = 37: quaternion base 7 q + 12 joints, 18 v; m = 12), T = 0.2,
dt = 4e-3 (N = 50), standing pose + feed-forward standing torques as the
initial guess (mini_cheetah.py:41-49), moving target advancing at
target_vel (mini_cheetah.py:52-57, 152-156), compliant hydroelastic-style
ground (modulus 5e6, mu 0.6/0.5, mini_cheetah.py:74-101), beta = 0.5,
delta = 1e-2 (mini_cheetah.py:168-169), receding-horizon MPC with
replan_steps = 4 (mini_cheetah.py:36-38, 180-213).

The robot model is the embedded mini_cheetah data (models/ — derived
from the reference's URDF numbers); the ground is an analytic halfspace
(the reference uses a Box(25,25,1) with its top face at z = 0,
mini_cheetah.py:98-101 — a halfspace is the TPU-native equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from drake_ddp_tpu.contact.geometry import (
    HALFSPACE,
    CollisionGeometry,
    ContactProps,
    GeometrySet,
    build_contact_model,
)
from drake_ddp_tpu.io.urdf import add_urdf
from drake_ddp_tpu.models import mini_cheetah as mini_cheetah_robot
from drake_ddp_tpu.multibody.model import ModelBuilder
from drake_ddp_tpu.multibody.plant import make_multibody_system
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator
from drake_ddp_tpu.solver.keypoints import DerivsInterpolation

# Standing configuration and feed-forward torques (mini_cheetah.py:41-49).
Q0 = np.asarray(
    [1.0, 0.0, 0.0, 0.0,          # base orientation (w, x, y, z)
     0.0, 0.0, 0.29,              # base position
     0.0, -0.8, 1.6,
     0.0, -0.8, 1.6,
     0.0, -0.8, 1.6,
     0.0, -0.8, 1.6]
)
U_STAND = np.array(
    [0.16370625, 0.42056475, -3.06492254, 0.16861717, 0.14882384,
     -2.43250739, 0.08305763, 0.26016952, -2.74586461, 0.08721941,
     0.02331732, -2.18319231]
)


@dataclasses.dataclass(frozen=True)
class Config:
    T: float = 0.2
    dt: float = 4e-3
    target_vel: float = 1.0
    # MPC (mini_cheetah.py:36-38)
    num_resolves: int = 1
    replan_steps: int = 4
    # solver (mini_cheetah.py:168-169)
    beta: float = 0.5
    delta: float = 1e-2
    gamma: float = 0.0
    # contact (mini_cheetah.py:74-80)
    mu_static: float = 0.6
    mu_dynamic: float = 0.5
    dissipation: float = 0.0
    hydroelastic_modulus: float = 5e6
    resolution_hint: float = 0.1
    # 4 Newton iterations, not 2: with the stiff zero-dissipation ground
    # at dt = 4e-3, 2 iterations under-resolve fast foot impacts and
    # inject energy — receding-horizon chains then fall over within ~10
    # resolves; at 4 the 20-resolve walking chain stays bounded.
    contact_iters: int = 4
    # Narrow force smoothing: at dt = 4e-3 with zero dissipation, the
    # library's wider optimizability default (3e-3) lets hovering feet
    # pick up phantom forces that pump energy into the gait rollout.
    smooth_width: float = 1e-3
    # derivative interpolation (mini_cheetah.py:26-32)
    use_derivative_interpolation: bool = False
    keypoint_method: str = "adaptiveJerk"
    minN: int = 2
    maxN: int = 20
    jerk_threshold: float = 0.3
    # static keypoint budget: enables sparse (lazy) Jacobian evaluation
    # for iterativeError; None = dense parity fallback (adaptiveJerk and
    # setInterval derive sufficient budgets automatically).
    max_keypoints: Optional[int] = None
    iterative_error_threshold: float = 10.0
    verbose: bool = True


def build_system(cfg: Config = Config()):
    """Robot + compliant ground -> DiscreteSystem (n=37, m=12)."""
    mb = ModelBuilder()
    gs = GeometrySet()
    add_urdf(mb, gs, mini_cheetah_robot(), floating=True)
    ground = ContactProps(
        modulus=cfg.hydroelastic_modulus,
        dissipation=cfg.dissipation,
        mu_static=cfg.mu_static,
        mu_dynamic=cfg.mu_dynamic,
        resolution_hint=cfg.resolution_hint,
    )
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3),
                             np.zeros(1), ground, name="ground"))
    model = mb.finalize()
    cm = build_contact_model(gs)
    from drake_ddp_tpu.contact.forces import ContactForceParams
    system = make_multibody_system(
        model, cm, cfg.dt, contact_iters=cfg.contact_iters,
        force_params=ContactForceParams(smooth_width=cfg.smooth_width))
    return system, model


def costs(cfg: Config = Config()):
    """Quadratic weights (mini_cheetah.py:60-70)."""
    Qq_base = np.ones(7)
    Qq_base[0:4] += 2
    Qv_base = np.ones(6)
    Qq_legs = 0.0 * np.ones(12)
    Qv_legs = 0.01 * np.ones(12)
    Q = np.diag(np.hstack([Qq_base, Qq_legs, 0.01 * Qv_base, Qv_legs]))
    R = 0.01 * np.eye(12)
    Qf = np.diag(np.hstack([5 * Qq_base, 0.1 + Qq_legs, Qv_base, Qv_legs]))
    return Q, R, Qf


def initial_and_target(cfg: Config = Config()):
    """x0 and moving-target x_nom (mini_cheetah.py:52-57)."""
    x0 = np.hstack([Q0, np.zeros(18)])
    x_nom = np.hstack([Q0, np.zeros(18)])
    x_nom[4] += cfg.target_vel * cfg.T   # base x position
    x_nom[22] += cfg.target_vel          # base x velocity
    return x0, x_nom


def build_solver(cfg: Config = Config()):
    system, _ = build_system(cfg)
    num_steps = int(cfg.T / cfg.dt)
    interp: Optional[DerivsInterpolation] = None
    if cfg.use_derivative_interpolation:
        interp = DerivsInterpolation(
            cfg.keypoint_method, cfg.minN, cfg.maxN,
            cfg.jerk_threshold, cfg.iterative_error_threshold,
            max_keypoints=cfg.max_keypoints,
        )
    ilqr = IterativeLinearQuadraticRegulator(
        system, num_steps, beta=cfg.beta, delta=cfg.delta, gamma=cfg.gamma,
        derivs_keypoint_method=interp, verbose=cfg.verbose,
        raise_on_divergence=False,
    )
    Q, R, Qf = costs(cfg)
    x0, x_nom = initial_and_target(cfg)
    ilqr.SetTargetState(x_nom)
    ilqr.SetRunningCost(cfg.dt * Q, cfg.dt * R)
    ilqr.SetTerminalCost(Qf)
    ilqr.SetInitialState(x0)
    ilqr.SetInitialGuess(np.repeat(U_STAND[None].T, num_steps - 1, axis=1))
    return ilqr, x0, x_nom


def run(cfg: Config = Config(), stream=None):
    """Initial solve + MPC resolves; returns the stitched state history
    (mini_cheetah.py:180-216).

    ``stream``: optional viz.stream.MPCStream — records every resolve's
    predicted trajectory for the ghost-overlay HTML player (the
    TPU-native analog of the reference publishing each resolve to the
    live visualizer, mini_cheetah.py:208-213)."""
    import time

    ilqr, x0, x_nom = build_solver(cfg)
    num_steps = int(cfg.T / cfg.dt)
    rs = cfg.replan_steps
    total_steps = num_steps + rs * cfg.num_resolves
    states = np.zeros((37, total_steps))

    st = time.time()
    x, u, _, cost = ilqr.Solve()
    states[:, 0:num_steps] = x
    if stream is not None:
        stream.record(x)

    for i in range(cfg.num_resolves):
        if cfg.verbose:
            print(f"\nRunning resolve {i + 1}/{cfg.num_resolves}\n")
        # warm start: shift tape, repeat last input (mini_cheetah.py:193-197)
        u_guess = np.block([
            u[:, rs:], np.repeat(u[:, -1:], rs, axis=1)
        ])
        # open-loop handoff + moving target (mini_cheetah.py:152-156, 198)
        x_nom[4] += cfg.target_vel * cfg.dt * rs
        ilqr.SetInitialState(x[:, rs])
        ilqr.SetInitialGuess(u_guess)
        ilqr.SetTargetState(x_nom)
        x, u, _, cost = ilqr.Solve()
        if stream is not None:
            stream.record(x)
        start = (i + 1) * rs
        states[:, start:start + num_steps] = x

    solve_time = time.time() - st
    print(f"Solved in {solve_time} seconds using iLQR")
    return states, u, solve_time, cost


if __name__ == "__main__":
    import sys

    if "--live" in sys.argv:
        # live per-resolve viewing (the reference's visualizer role,
        # mini_cheetah.py:208-213): open /tmp/cheetah_live.html in a
        # browser while this runs — it auto-reloads every 2 s
        from drake_ddp_tpu.viz.stream import MPCStream

        _cfg = Config()
        _system, _model = build_system(_cfg)
        _stream = MPCStream(replan_steps=_cfg.replan_steps,
                            live_path="/tmp/cheetah_live.html",
                            model=_model, contact=_system.params[1],
                            dt=_cfg.dt)
        run(_cfg, stream=_stream)
        print("live player: /tmp/cheetah_live.html")
    else:
        run()
