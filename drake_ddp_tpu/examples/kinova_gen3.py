"""Kinova Gen3 whole-arm ball manipulation (contact-implicit).

Task parity with reference kinova_gen3.py: a 7-dof Kinova Gen3 arm with a
welded static Robotiq 2F-85 gripper pushes/lifts a 0.1 m ball on the
ground.  n = 27 (7 arm q + 7 ball quaternion-pose q + 13 v), m = 7;
T = 0.5, dt = 1e-2 (N = 50); three scenarios "lift" / "forward" / "side"
choosing start pose and ball target (kinova_gen3.py:23, 54-67);
gravity-compensation initial guess (kinova_gen3.py:268-275); solver
beta = 0.5, delta = 1e-3, gamma = 0 (kinova_gen3.py:258-259).

TPU-native deltas: the arm/gripper mesh collisions are pre-approximated
to spheres (models/ data; Drake tessellates the meshes), the ground box
is an analytic halfspace, and the gripper<->arm collision filter
(kinova_gen3.py:127-154) plus joint-adjacency filters are applied at
scene-build time.  side/forward solve at the reference's delta = 1e-3;
the lift scenario overrides to 1e-5 (see Config.delta).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from drake_ddp_tpu.contact.geometry import (
    HALFSPACE,
    SPHERE,
    CollisionGeometry,
    ContactProps,
    GeometrySet,
    build_contact_model,
)
from drake_ddp_tpu.io.urdf import add_urdf
from drake_ddp_tpu.models import gripper_static, kinova_gen3
from drake_ddp_tpu.multibody.algorithms import gravity_compensation
from drake_ddp_tpu.multibody.model import FREE, ModelBuilder
from drake_ddp_tpu.multibody.plant import make_multibody_system
from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator
from drake_ddp_tpu.solver.keypoints import DerivsInterpolation
from drake_ddp_tpu.utils.spatial import rpy_to_rot

# Joint-angle definitions (kinova_gen3.py:44-47).
Q_HOME = np.pi / 180 * np.array([0, 15, 180, 230, 0, 55, 90])
Q_RETRACT = np.array([0, 5.93 - 2 * np.pi, np.pi, 3.734 - 2 * np.pi,
                      0, 5.408 - 2 * np.pi, np.pi / 2])
Q_PUSH = np.array([0.0, np.pi / 4 + 0.13, np.pi, 4.4 - 2 * np.pi,
                   0, 1.2, np.pi / 2])
Q_WRAP = np.pi / 180 * np.array([55, 125, 114, 244, 217, 45, 8])

BALL_RADIUS = 0.1
BALL_MASS = 0.258


@dataclasses.dataclass(frozen=True)
class Config:
    scenario: str = "side"        # "lift", "forward", or "side"
    T: float = 0.5
    dt: float = 1e-2
    beta: float = 0.5
    # Convergence threshold.  None = per-scenario default: the
    # REFERENCE's delta=1e-3 (kinova_gen3.py:259) for side/forward —
    # round-5 re-measurement (tools/probe_kinova.py, ci=8 + sw=1e-2 +
    # stiction-continuation Newton) shows both now converge there
    # (side: 96% of the 15 cm target, cost 1.29; forward: 90%, cost
    # 2.53; the round-4 "stalls at cost ~5" note predated those solver
    # fixes) — and 1e-5 for lift, where the WRAP-pose raise genuinely
    # stalls at 1e-3 (16% progress, linesearch collapse at iter ~27;
    # the finer threshold grinds through to a smooth hold-lift of
    # ~10 of 20 cm within the 0.5 s horizon,
    # tests/test_robot_examples.py pins side and lift).
    delta: Optional[float] = None
    gamma: float = 0.0
    # contact (kinova_gen3.py:90-99)
    dissipation: float = 5.0
    hydroelastic_modulus: float = 5e6
    resolution_hint: float = 0.05
    mu_static: float = 0.3
    mu_dynamic: float = 0.2
    # 8 Newton iterations: the manipulation contacts (E=5e6 gripper/
    # ball/ground stack) are much stiffer than the cheetah's feet; at
    # contact_iters<=4 the under-converged root degrades the IFT
    # derivatives enough that iLQR crawls (eps ~1e-4 accepted steps,
    # 23% task progress at 40 iters); at 8 it takes healthy 0.25-1.0
    # steps and converges in ~25 iterations (98% progress, cost 1.11,
    # with the stiction-continuation Newton — forces.stiction_schedule).
    contact_iters: int = 8
    # Force-onset smoothing (plant.ContactForceParams): 1 cm eases the
    # gripper's 5 mm approach gap into the gradient's reach; tightening
    # to the 3e-3 default costs ~35% more iterations at equal final
    # quality at a 40-iteration budget.
    smooth_width: float = 1e-2
    # derivative interpolation (kinova_gen3.py:36-41)
    use_derivative_interpolation: bool = False
    keypoint_method: str = "adaptiveJerk"
    minN: int = 5
    maxN: int = 40
    jerk_threshold: float = 1e-4
    # static keypoint budget: enables sparse (lazy) Jacobian evaluation
    # for iterativeError; None = dense parity fallback (adaptiveJerk and
    # setInterval derive sufficient budgets automatically).
    max_keypoints: Optional[int] = None
    iterative_error_threshold: float = 1e-2
    verbose: bool = True
    mesh_max_spheres: int = 4
    # Opt-in Drake-style patch integration for the finger-pad boxes vs
    # the ball: 8-corner elastic-foundation quadrature instead of one
    # closest-point contact (geometry.build_contact_model
    # box_face_quadrature).  Default OFF: the ball (r = 0.05) is small
    # relative to the pad's curvature sag at the corner sample points
    # (~1.2 mm > the sub-mm penetration scale), where the calibrated
    # point model is the better physics — see
    # tests/test_pad_quadrature.py for the measured regimes.
    pad_face_quadrature: bool = False


def scenario_states(cfg: Config):
    """x0 / x_nom per scenario (kinova_gen3.py:49-71)."""
    r = BALL_RADIUS
    q_ball_start = np.array([0, 0, 0, 1, 0.6, 0.0, r], float)
    q_ball_target = np.array([0, 0, 0, 1, 0.6, 0.0, r], float)
    if cfg.scenario == "lift":
        q_ball_start[4] = 0.155
        q_ball_target[6] += 0.2
    elif cfg.scenario == "forward":
        q_ball_target[4] += 0.2
    elif cfg.scenario == "side":
        q_ball_target[5] += 0.15
    else:
        raise RuntimeError(f"Unknown scenario {cfg.scenario}")
    q_start = Q_WRAP if cfg.scenario == "lift" else Q_PUSH
    x0 = np.hstack([q_start, q_ball_start, np.zeros(13)])
    x_nom = np.hstack([q_start, q_ball_target, np.zeros(13)])
    return x0, x_nom


def costs(cfg: Config):
    """Quadratic weights (kinova_gen3.py:73-87)."""
    Qq_robot = 0.0 * np.ones(7)
    Qv_robot = 0.1 * np.ones(7)
    Qq_ball = 1.0 * np.array([0, 0, 0, 0, 100, 100, 100], float)
    if cfg.scenario == "lift":
        Qq_ball[4] = 0
        Qq_ball[5] = 0
    Qv_ball = 0.1 * np.ones(6)
    Q = np.diag(np.hstack([Qq_robot, Qq_ball, Qv_robot, Qv_ball]))
    R = 0.01 * np.eye(7)
    Qf = np.diag(np.hstack([Qq_robot, Qq_ball, Qv_robot, 10 * Qv_ball]))
    return Q, R, Qf


def build_system(cfg: Config = Config()):
    """Arm (welded base +1.5 cm) + static gripper (welded at the end
    effector, yaw pi/2) + free ball + ground (kinova_gen3.py:104-211)."""
    mb = ModelBuilder()
    gs = GeometrySet()
    arm_idx = add_urdf(mb, gs, kinova_gen3(), floating=False,
                       base_pos=(0, 0, 0.015),
                       mesh_max_spheres=cfg.mesh_max_spheres)
    grip_idx = add_urdf(
        mb, gs, gripper_static(),
        base_parent=arm_idx["end_effector_link"],
        base_rot=rpy_to_rot((0.0, 0.0, np.pi / 2)),
        floating=False, mesh_max_spheres=cfg.mesh_max_spheres,
    )
    # collision filter between gripper and arm bodies
    # (kinova_gen3.py:127-154)
    for gb in grip_idx.values():
        for ab in arm_idx.values():
            gs.exclude_body_pair(gb, ab)

    friction = dict(mu_static=cfg.mu_static, mu_dynamic=cfg.mu_dynamic)
    ball_props = ContactProps(
        modulus=cfg.hydroelastic_modulus, dissipation=cfg.dissipation,
        resolution_hint=cfg.resolution_hint, **friction,
    )
    ground_props = ContactProps(
        modulus=cfg.hydroelastic_modulus, dissipation=cfg.dissipation,
        resolution_hint=cfg.resolution_hint,
        mu_static=0.7 * cfg.mu_static, mu_dynamic=0.7 * cfg.mu_dynamic,
    )
    # free ball with hollow-sphere inertia (kinova_gen3.py:177-206)
    I_ball = (2.0 / 3.0) * BALL_MASS * BALL_RADIUS ** 2 * np.eye(3)
    ball = mb.add_body("ball", -1, FREE, mass=BALL_MASS, inertia=I_ball)
    gs.add(CollisionGeometry(ball, SPHERE, np.zeros(3), np.eye(3),
                             np.array([BALL_RADIUS]), ball_props, "ball"))
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3),
                             np.zeros(1), ground_props, "ground"))
    model = mb.finalize()
    cm = build_contact_model(
        gs, box_face_quadrature=cfg.pad_face_quadrature)
    from drake_ddp_tpu.contact.forces import ContactForceParams

    system = make_multibody_system(
        model, cm, cfg.dt, contact_iters=cfg.contact_iters,
        force_params=ContactForceParams(smooth_width=cfg.smooth_width))
    return system, model


def build_solver(cfg: Config = Config()):
    system, model = build_system(cfg)
    num_steps = int(cfg.T / cfg.dt)
    interp: Optional[DerivsInterpolation] = None
    if cfg.use_derivative_interpolation:
        interp = DerivsInterpolation(
            cfg.keypoint_method, cfg.minN, cfg.maxN,
            cfg.jerk_threshold, cfg.iterative_error_threshold,
            max_keypoints=cfg.max_keypoints,
        )
    # per-scenario convergence threshold (see Config.delta)
    delta = cfg.delta if cfg.delta is not None else (
        1e-5 if cfg.scenario == "lift" else 1e-3)
    ilqr = IterativeLinearQuadraticRegulator(
        system, num_steps, beta=cfg.beta, delta=delta, gamma=cfg.gamma,
        derivs_keypoint_method=interp, verbose=cfg.verbose,
        raise_on_divergence=False,
    )
    x0, x_nom = scenario_states(cfg)
    Q, R, Qf = costs(cfg)
    ilqr.SetInitialState(x0)
    ilqr.SetTargetState(x_nom)
    ilqr.SetRunningCost(cfg.dt * Q, cfg.dt * R)
    ilqr.SetTerminalCost(Qf)
    # gravity-compensation initial guess (kinova_gen3.py:268-275)
    import jax.numpy as jnp
    u_gc = np.asarray(gravity_compensation(
        model, jnp.asarray(x0[:model.nq], jnp.float32)))
    ilqr.SetInitialGuess(np.repeat(u_gc[None].T, num_steps - 1, axis=1))
    return ilqr


def run(cfg: Config = Config(), save_file: Optional[str] = None):
    ilqr = build_solver(cfg)
    x, u, solve_time, cost = ilqr.Solve()
    print(f"Solved in {solve_time} seconds using iLQR")
    print(f"Optimal cost: {cost}")
    if save_file:
        ilqr.SaveSolution(save_file)  # (kinova_gen3.py:284)
    return x, u, solve_time, cost


def simulate(cfg: Config = Config(), sim_time: Optional[float] = None,
             html_out: Optional[str] = None):
    """Passive (zero-torque) simulation — the reference's ``simulate``
    mode flag (kinova_gen3.py:17-21): run the plant from the scenario's
    initial state without optimizing.  Returns states (n, T) in the
    reference layout; optionally writes the HTML player."""
    import jax
    import jax.numpy as jnp

    system, model = build_system(cfg)
    x0, _ = scenario_states(cfg)
    T = int((cfg.T if sim_time is None else sim_time) / cfg.dt)
    step = system.bound_step()
    u0 = jnp.zeros((system.m,), jnp.float32)

    def body(x, _):
        xn = step(x, u0)
        return xn, xn

    _, xs = jax.lax.scan(body, jnp.asarray(x0, jnp.float32), None, length=T)
    states = np.asarray(xs).T
    if html_out is not None:
        from drake_ddp_tpu.viz import export_html

        export_html(html_out, model, system.params[1], states, cfg.dt)
    return states


def playback(save_file: str, cfg: Config = Config(),
             html_out: Optional[str] = None):
    """Replay a previously saved solution without re-optimizing
    (reference optimize=False path, kinova_gen3.py:292-311): returns
    (t, x_bar) and optionally writes the self-contained HTML player."""
    from drake_ddp_tpu.io.solution import load_solution

    sol = load_solution(save_file)
    if html_out is not None:
        from drake_ddp_tpu.viz import export_html

        system, model = build_system(cfg)
        export_html(html_out, model, system.params[1], sol["x_bar"],
                    cfg.dt, playback_rate=0.125)  # (kinova_gen3.py:35)
    return sol["t"], sol["x_bar"]


if __name__ == "__main__":
    run()
