"""Robot-example integration tests (reference kinova_gen3.py,
panda_fr3.py, mini_cheetah.py) on reduced horizons: the solver must make
real progress through contact without diverging."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, solve_ilqr


def _solve(system, model, x0, x_nom, Q, R, Qf, u0, N, dt, iters=6,
           delta=1e-3):
    dtype = jnp.float32
    prob = ILQRProblem(
        x0=jnp.asarray(x0, dtype), x_nom=jnp.asarray(x_nom, dtype),
        Q=jnp.asarray(dt * Q, dtype), R=jnp.asarray(dt * R, dtype),
        Qf=jnp.asarray(Qf, dtype),
        u_init=jnp.tile(jnp.asarray(u0, dtype), (N - 1, 1)),
    )
    cfg = ILQRConfig(num_steps=N, delta=delta, beta=0.5, max_iters=iters)
    return jax.jit(lambda p: solve_ilqr(system, cfg, p))(prob)


def test_kinova_side_scenario_improves():
    from drake_ddp_tpu.examples import kinova_gen3 as kg
    cfg = kg.Config(scenario="side", T=0.2)  # N = 20
    system, model = kg.build_system(cfg)
    assert (system.n, system.m) == (27, 7)
    x0, x_nom = kg.scenario_states(cfg)
    Q, R, Qf = kg.costs(cfg)
    from drake_ddp_tpu.multibody.algorithms import gravity_compensation
    u0 = np.asarray(gravity_compensation(
        model, jnp.asarray(x0[:model.nq], jnp.float32)))
    sol = _solve(system, model, x0, x_nom, Q, R, Qf, u0, 20, cfg.dt)
    it = int(sol.iterations)
    costs = np.asarray(sol.stats.cost)[:it]
    assert np.all(np.isfinite(costs))
    assert not bool(sol.diverged)
    # strictly improved over the gravity-comp rollout
    assert costs[-1] < costs[0]


def test_panda_forward_scenario_improves():
    from drake_ddp_tpu.examples import panda_fr3 as pf
    cfg = pf.Config(scenario="forward", T=0.2)
    system, model = pf.build_system(cfg)
    assert (system.n, system.m) == (27, 7)
    x0, x_nom = pf.scenario_states(cfg)
    Q, R, Qf = pf.costs(cfg)
    from drake_ddp_tpu.multibody.algorithms import gravity_compensation
    u0 = np.asarray(gravity_compensation(
        model, jnp.asarray(x0[:model.nq], jnp.float32)))
    sol = _solve(system, model, x0, x_nom, Q, R, Qf, u0, 20, cfg.dt)
    it = int(sol.iterations)
    costs = np.asarray(sol.stats.cost)[:it]
    assert np.all(np.isfinite(costs))
    assert costs[-1] < costs[0]


def test_mini_cheetah_short_horizon_converges():
    from drake_ddp_tpu.examples import mini_cheetah as mc
    cfg = mc.Config()
    system, model = mc.build_system(cfg)
    assert (system.n, system.m) == (37, 12)
    x0, x_nom = mc.initial_and_target(cfg)
    Q, R, Qf = mc.costs(cfg)
    sol = _solve(system, model, x0, x_nom, Q, R, Qf, mc.U_STAND, 10,
                 cfg.dt, iters=8, delta=1e-2)
    it = int(sol.iterations)
    costs = np.asarray(sol.stats.cost)[:it]
    assert np.all(np.isfinite(costs))
    assert not bool(sol.diverged)
    # the standing start is already near-optimal for a short horizon
    # (cost ~1.3); the solver must still strictly improve it
    assert costs[-1] < costs[0]
    assert np.all(np.diff(costs) <= 1e-6)  # monotone non-increasing


def test_mini_cheetah_standing_is_near_equilibrium():
    """Standing pose + u_stand over the task horizon (T = 0.2 s,
    mini_cheetah.py:22,41-49): the base holds height and attitude.
    (Open-loop standing is unstable over longer horizons — feed-forward
    torques alone cannot balance; the reference only ever rolls the
    optimizer's closed-loop result.)"""
    from drake_ddp_tpu.examples import mini_cheetah as mc
    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    u = jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32), (50, 1))
    traj = system.rollout(jnp.asarray(x0, jnp.float32), u)
    assert bool(jnp.all(jnp.isfinite(traj)))
    z = np.asarray(traj[:, 6])
    assert abs(z[-1] - 0.29) < 0.03   # base height holds over the horizon
    quat_w = np.asarray(traj[:, 0])
    assert quat_w[-1] > 0.99          # no flipping


def test_kinova_simulate_mode():
    """Passive simulation mode (reference kinova_gen3.py:17-21): the arm
    falls under gravity, the ball stays on the table — finite states,
    correct reference layout."""
    import dataclasses

    from drake_ddp_tpu.examples import kinova_gen3 as kg

    cfg = dataclasses.replace(kg.Config(), verbose=False)
    states = kg.simulate(cfg, sim_time=0.1)
    n = states.shape[0]
    assert states.shape[1] == int(0.1 / cfg.dt)
    assert np.all(np.isfinite(states))
    # passive: no actuation -> the arm moved (gravity), ball z sane
    x0, _ = kg.scenario_states(cfg)
    assert not np.allclose(states[:, -1], x0, atol=1e-5)


# -- full-scenario goldens + task-goal assertions (VERDICT item 9) ------
#
# These run the COMPLETE reference scenarios (T = 0.5, N = 50) through
# the example entry points and pin converged cost + achieved ball motion.
# Golden values recorded on CPU f32 at the example defaults
# (contact_iters=8, smooth_width=1e-2, and the REFERENCE's delta=1e-3
# for side/forward — round 5 re-measured that they converge there; lift
# keeps a 1e-5 override, see the kinova Config docstring); a >2% cost
# move means the physics or solver changed — update the pin in the same
# commit and say why.


def test_kinova_side_full_scenario_golden():
    """Reference kinova_gen3.py 'side' task: push the ball 15 cm in +y.
    The solve must actually move the ball most of the way (98% recorded),
    not merely improve the cost."""
    from drake_ddp_tpu.examples import kinova_gen3 as kg

    cfg = dataclasses.replace(kg.Config(), scenario="side", verbose=False)
    ilqr = kg.build_solver(cfg)
    x, u, t, c = ilqr.Solve()
    # 1.2865 at the reference's delta=1e-3 (round 5; the solve stops a
    # little earlier than the old delta=1e-5 pin of 1.1678 but the ball
    # still travels 96% of the way — dy 0.1443)
    assert c == pytest.approx(1.2865, rel=0.02)
    x0, x_nom = kg.scenario_states(cfg)
    # ball displacement projected onto the commanded direction (+y)
    dy = x[12, -1] - x0[12]
    assert dy > 0.10                      # >2/3 of the 0.15 m target
    assert abs(x[13, -1] - 0.1) < 0.03    # ball stays on the ground
    assert float(x[13].min()) > 0.08      # never squashed into the ground


def test_kinova_lift_full_scenario_golden():
    """Reference kinova_gen3.py 'lift' task (kinova_gen3.py:54-67): the
    arm starts in the WRAP pose around the ball and must raise it.  With
    the refined gripper sphere cover (refine=2.5: fingers are 5 tight
    spheres instead of 3 bloated ones) the solve is a smooth hold-lift —
    the ball rises monotonically through the horizon (z profile
    0.10 -> 0.197 of the 0.30 target at T=0.5 s) instead of a late
    ballistic fling (the coarse cover's higher-cost solution)."""
    from drake_ddp_tpu.examples import kinova_gen3 as kg

    cfg = dataclasses.replace(kg.Config(), scenario="lift", verbose=False)
    ilqr = kg.build_solver(cfg)
    x, u, t, c = ilqr.Solve()
    assert c == pytest.approx(6.656, rel=0.02)
    z = x[13]
    assert z[-1] - z[0] > 0.08            # the ball actually rises
    # held lift, not a fling: monotone rise (small contact ripple ok)
    assert np.all(np.diff(z[::5]) > -0.005)


def test_panda_side_full_scenario_golden():
    """Reference panda_fr3.py 'side' task: cost pin + the ball moves
    more than half of the 15 cm target sideways."""
    from drake_ddp_tpu.examples import panda_fr3 as pf

    cfg = dataclasses.replace(pf.Config(), scenario="side", verbose=False)
    ilqr = pf.build_solver(cfg)
    x, u, t, c = ilqr.Solve()
    assert c == pytest.approx(3.1914, rel=0.02)
    x0, x_nom = pf.scenario_states(cfg)
    dy = x[12, -1] - x0[12]
    assert dy > 0.09
    assert abs(x[13, -1] - 0.1) < 0.03
    assert float(x[13].min()) > 0.08


def test_articulated_gripper_builds_and_steps():
    """C10 inventory parity: the articulated Robotiq 2F-85 variant
    (reference models/2f_85_gripper/urdf/robotiq_2f_85.urdf) builds into
    a finite-stepping system.  The reference's own examples weld the
    static variant; this pins the asset itself."""
    import jax.numpy as jnp

    from drake_ddp_tpu.contact.geometry import (GeometrySet,
                                                build_contact_model)
    from drake_ddp_tpu.io.urdf import add_urdf
    from drake_ddp_tpu.models import gripper_articulated
    from drake_ddp_tpu.multibody.model import ModelBuilder
    from drake_ddp_tpu.multibody.plant import make_multibody_system

    mb = ModelBuilder()
    gs = GeometrySet()
    add_urdf(mb, gs, gripper_articulated(), floating=False)
    model = mb.finalize()
    assert model.nb == 11 and model.nq == 6 and model.nu >= 1
    cm = build_contact_model(gs)
    system = make_multibody_system(model, cm, 1e-2, contact_iters=2)
    x = jnp.zeros(model.nq + model.nv).at[:model.nq].set(
        jnp.asarray(model.default_q()))
    x1 = system.step(x, jnp.zeros(model.nu))
    assert bool(jnp.all(jnp.isfinite(x1)))


def test_panda_forward_full_scenario_golden():
    """Reference panda_fr3.py 'forward' task at the reference's
    delta=1e-3 (the round-5 default): the ball rolls essentially the
    whole 20 cm (recorded: 0.1991, cost 1.5345 — unchanged from the
    old delta=1e-5 pin)."""
    from drake_ddp_tpu.examples import panda_fr3 as pf

    cfg = dataclasses.replace(pf.Config(), scenario="forward",
                              verbose=False)
    ilqr = pf.build_solver(cfg)
    x, u, t, c = ilqr.Solve()
    assert c == pytest.approx(1.5345, rel=0.02)
    x0, _ = pf.scenario_states(cfg)
    assert float(x[11, -1] - x0[11]) > 0.15
    assert float(x[13].min()) > 0.08
