"""Physics parity against the independent f64 NumPy mirror
(tests/np_physics_mirror.py).

BASELINE.md's correctness criterion is per-solve cost within 1% of the
Drake reference.  pydrake cannot run here (no installs, zero egress), so
these tests hold the JAX implementation to an *independently derived*
float64 implementation of the same specification instead — Lagrangian /
Newton-Euler dynamics, the documented contact force law, FD Newton
Jacobians, np.linalg solves — with nothing shared but the spec:

1. the multibody contact STEP matches over a 60-step tumbling-brick
   trajectory (quaternion base, gyroscopic torque, friction,
   dissipation) to ~1e-6;
2. the full wall-bounce iLQR SOLVE (reference task
   cart_pole_with_wall.py) lands within 1% cost of the mirror's
   eager-NumPy iLQR run with FD derivatives — the BASELINE criterion
   transposed onto the runnable evidence this environment permits.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.np_physics_mirror import FreeBodyOnGround, WallCartPole
from tests.np_spec_mirror import solve_ilqr_np


def _brick_system_f64(dt=1e-2, iters=8):
    """f64 build of a free asymmetric-inertia body with a collision
    sphere on compliant ground (mirror of FreeBodyOnGround)."""
    from drake_ddp_tpu.contact.forces import ContactForceParams
    from drake_ddp_tpu.contact.geometry import (
        HALFSPACE, SPHERE, CollisionGeometry, ContactProps, GeometrySet,
        build_contact_model)
    from drake_ddp_tpu.multibody.model import FREE, ModelBuilder
    from drake_ddp_tpu.multibody.plant import make_multibody_system

    mass, radius = 0.6, 0.1
    inertia = np.diag([2e-3, 5e-3, 8e-3])
    mb = ModelBuilder()
    mb.add_body("brick", -1, FREE, mass=mass, inertia=inertia)
    model = mb.finalize(jnp.float64)
    props = ContactProps(modulus=5e6, dissipation=5.0,
                         mu_static=0.5, mu_dynamic=0.5)
    gs = GeometrySet()
    gs.add(CollisionGeometry(0, SPHERE, np.zeros(3), np.eye(3),
                             np.array([radius]), props))
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3),
                             np.zeros(1), props))
    cm = build_contact_model(gs, dtype=jnp.float64)
    system = make_multibody_system(
        model, cm, dt, contact_iters=iters,
        force_params=ContactForceParams(smooth_width=1e-3))
    mirror = FreeBodyOnGround(mass, inertia, radius, modulus=5e6,
                              dissipation=5.0, mu=0.5, ground_depth=0.5,
                              dt=dt, contact_iters=iters,
                              smooth_width=1e-3)
    return system, mirror


def test_brick_step_matches_independent_mirror():
    """60 steps of a spinning brick dropped on the ground: quaternion
    kinematics, Euler's equations, implicit contact with friction — the
    JAX engine vs the from-scratch NumPy mirror, both f64."""
    system, mirror = _brick_system_f64()
    x = np.zeros(13)
    x[:4] = [1.0, 0, 0, 0]
    x[6] = 0.13                    # 3 cm above touchdown
    x[7:10] = [6.0, -3.0, 2.0]     # tumbling
    x[10:13] = [0.4, -0.2, 0.0]    # sliding (friction active)

    step = jax.jit(system.bound_step())
    xj = jnp.asarray(x, jnp.float64)
    xn = np.array(x)
    for t in range(60):
        xj = step(xj, jnp.zeros(0, jnp.float64))
        xn = mirror.step(xn)
    err = np.max(np.abs(np.asarray(xj) - xn))
    assert err < 1e-6, err
    # and the physics did something interesting: it fell and settled
    assert float(xj[6]) < 0.12


def test_wall_bounce_solve_cost_within_1pct():
    """Full iLQR solve on the reference wall task, zero initial guess:
    JAX f64 solver vs the mirror's eager NumPy iLQR (FD derivatives
    through the Lagrangian wall-contact step).  BASELINE.md criterion:
    costs within 1%."""
    from drake_ddp_tpu.contact.forces import ContactForceParams
    from drake_ddp_tpu.contact.geometry import (
        BOX, SPHERE, CollisionGeometry, ContactProps, GeometrySet,
        build_contact_model)
    from drake_ddp_tpu.multibody.model import (PRISMATIC, REVOLUTE,
                                               ModelBuilder)
    from drake_ddp_tpu.multibody.plant import make_multibody_system
    from drake_ddp_tpu.solver.ilqr import (ILQRConfig, ILQRProblem,
                                           solve_ilqr)

    dt, N, iters = 1e-2, 60, 8
    # f64 rebuild of examples/cart_pole_with_wall.build_system
    mb = ModelBuilder()
    cart = mb.add_body("cart", -1, PRISMATIC, axis=(1, 0, 0),
                       mass=10.0, actuated=True)
    mb.add_body("pole", cart, REVOLUTE, axis=(0, -1, 0),
                mass=1.0, com=(0, 0, -0.5))
    model = mb.finalize(jnp.float64)
    gs = GeometrySet()
    gs.add(CollisionGeometry(
        1, SPHERE, np.array([0.0, 0.0, -0.5]), np.eye(3),
        np.array([0.05]),
        ContactProps(modulus=2e6, dissipation=0.0,
                     mu_static=1.0, mu_dynamic=1.0)))
    gs.add(CollisionGeometry(
        -1, BOX, np.array([-0.5, 0.0, 0.0]), np.eye(3),
        np.array([0.05, 0.5, 1.0]),
        ContactProps(modulus=np.inf, dissipation=0.0,
                     mu_static=1.0, mu_dynamic=1.0)))
    cm = build_contact_model(gs, dtype=jnp.float64)
    system = make_multibody_system(model, cm, dt, contact_iters=iters,
                                   force_params=ContactForceParams())

    x0 = np.array([0.0, np.pi + 0.5, 0.0, 0.0])
    x_nom = np.array([0.0, np.pi, 0.0, 0.0])
    Q = dt * np.diag([0.1, 1.0, 0.01, 0.01])
    R = dt * 0.001 * np.eye(1)
    Qf = np.diag([200.0, 200.0, 10.0, 10.0])
    max_iters, beta = 12, 0.5

    # --- independent mirror solve (eager f64, FD derivatives) ---------
    mirror = WallCartPole(dt=dt, contact_iters=iters)
    _, _, cost_np, hist = solve_ilqr_np(
        mirror.step, N, x0, x_nom, Q, R, Qf,
        np.zeros((N - 1, 1)), beta=beta, max_iters=max_iters)

    # --- JAX solve, same config (reg=0: reference semantics) ----------
    cfg = ILQRConfig(num_steps=N, beta=beta, max_iters=max_iters,
                     reg=0.0)
    prob = ILQRProblem(
        x0=jnp.asarray(x0), x_nom=jnp.asarray(x_nom),
        Q=jnp.asarray(Q), R=jnp.asarray(R), Qf=jnp.asarray(Qf),
        u_init=jnp.zeros((N - 1, 1), jnp.float64))
    sol = jax.jit(lambda p: solve_ilqr(system, cfg, p))(prob)
    cost_jax = float(sol.cost)

    assert not bool(sol.diverged)
    assert cost_jax == pytest.approx(cost_np, rel=0.01), (cost_jax,
                                                          cost_np)
    # both tracked a comparable iteration path, not just the same
    # endpoint (+-3: late improvements sit near delta, so the two f64
    # implementations may cross the convergence threshold a few apart)
    assert abs(int(sol.iterations) - len(hist)) <= 3


def _cheetah_system_f64(iters=8):
    """f64 build of the flagship quadruped + ground (mirror of
    examples/mini_cheetah.py build_system)."""
    from drake_ddp_tpu.contact.forces import ContactForceParams
    from drake_ddp_tpu.contact.geometry import (
        HALFSPACE, CollisionGeometry, ContactProps, GeometrySet,
        build_contact_model)
    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.io.urdf import add_urdf
    from drake_ddp_tpu.models import mini_cheetah as mini_cheetah_robot
    from drake_ddp_tpu.multibody.model import ModelBuilder
    from drake_ddp_tpu.multibody.plant import make_multibody_system

    cfg = mc.Config(contact_iters=iters)
    mb = ModelBuilder()
    gs = GeometrySet()
    add_urdf(mb, gs, mini_cheetah_robot(), floating=True)
    ground = ContactProps(modulus=cfg.hydroelastic_modulus,
                          dissipation=cfg.dissipation,
                          mu_static=cfg.mu_static,
                          mu_dynamic=cfg.mu_dynamic,
                          resolution_hint=cfg.resolution_hint)
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3),
                             np.zeros(1), ground, name="ground"))
    model = mb.finalize(jnp.float64)
    cm = build_contact_model(gs, dtype=jnp.float64)
    system = make_multibody_system(
        model, cm, cfg.dt, contact_iters=iters,
        force_params=ContactForceParams(smooth_width=cfg.smooth_width))
    return system, model, cm, cfg


def _cheetah_mirror(model, cm, cfg, iters=8):
    from tests.np_physics_mirror import FloatingTreeMirror

    f = lambda a: np.asarray(a, float)
    topo = dict(parent=model.parent, joint_type=model.joint_type,
                q_start=model.q_start, v_start=model.v_start,
                nq=model.nq, nv=model.nv)
    data = dict(X_PJ_rot=f(model.X_PJ_rot), X_PJ_pos=f(model.X_PJ_pos),
                axis=f(model.axis), mass=f(model.mass), com=f(model.com),
                inertia=f(model.inertia), damping=f(model.damping),
                armature=f(model.armature), gravity=f(model.gravity),
                B=model.actuation_matrix())
    ct = dict(sph_body=cm.sph_body, sph_offset=f(cm.sph_offset),
              sph_radius=f(cm.sph_radius), hs_normal=f(cm.hs_normal),
              hs_offset=f(cm.hs_offset), box_body=cm.box_body,
              box_rot=f(cm.box_rot), box_pos=f(cm.box_pos),
              box_half=f(cm.box_half),
              pair_sh_s=cm.pair_sh_s, pair_sh_h=cm.pair_sh_h,
              sh_K=f(cm.sh_K), sh_d=f(cm.sh_d), sh_mu=f(cm.sh_mu),
              pair_sb_s=cm.pair_sb_s, pair_sb_b=cm.pair_sb_b,
              sb_K=f(cm.sb_K), sb_d=f(cm.sb_d), sb_mu=f(cm.sb_mu),
              pair_bh_b=cm.pair_bh_b, pair_bh_h=cm.pair_bh_h,
              bh_g=f(cm.bh_g), bh_d=f(cm.bh_d), bh_mu=f(cm.bh_mu))
    return FloatingTreeMirror(topo, data, ct, dt=cfg.dt,
                              contact_iters=iters,
                              smooth_width=cfg.smooth_width)


def test_cheetah_step_matches_independent_mirror():
    """The FLAGSHIP physics (floating-base quadruped, 4 foot-sphere
    ground contacts in stiff stiction, torso box pairs) against the
    from-scratch D'Alembert + FD-Jacobian NumPy mirror, per step along
    a 40-step standing/loading snippet (dt = 4e-3, the bench problem's
    dynamics).  Chaos makes chained-trajectory comparison meaningless,
    so each step is pinned from the same (JAX-rolled) state."""
    from drake_ddp_tpu.examples import mini_cheetah as mc

    system, model, cm, cfg = _cheetah_system_f64()
    mirror = _cheetah_mirror(model, cm, cfg)

    rng = np.random.default_rng(7)
    x = np.hstack([np.asarray(mc.Q0, float), np.zeros(18)])
    x[19:] += 0.05 * rng.standard_normal(18)       # bench noise class
    u_stand = np.asarray(mc.U_STAND, float)
    step = jax.jit(system.bound_step())

    worst = 0.0
    for t in range(40):
        u = u_stand + 0.2 * rng.standard_normal(12)
        x_jax = np.asarray(step(jnp.asarray(x), jnp.asarray(u)))
        x_np = mirror.step(x, u)
        err = np.abs(x_jax - x_np)
        # scale: positions O(0.3), velocities up to O(10)
        worst = max(worst, float(err.max()))
        assert err.max() < 2e-5, (t, err.max(), np.argmax(err))
        x = x_jax                                   # follow the JAX roll
    assert worst < 2e-5


def _kinova_system_f64(iters=8):
    """f64 build of the manipulation scene (mirror of
    examples/kinova_gen3.py build_system): arm + welded static gripper
    + free ball + ground."""
    import dataclasses

    from drake_ddp_tpu.examples import kinova_gen3 as kg

    cfg = dataclasses.replace(kg.Config(), scenario="side",
                              contact_iters=iters)
    # rebuild at f64 by re-running the example's builder with f64 dtypes
    from drake_ddp_tpu.contact.forces import ContactForceParams
    from drake_ddp_tpu.multibody.plant import make_multibody_system

    system32, model32 = kg.build_system(cfg)
    # recast the example's f32 build (model tables + contact tables are
    # exact small constants) to f64 leaves
    import jax.numpy as jnp

    to64 = lambda tree: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64)
        if hasattr(a, "dtype") and jnp.issubdtype(
            jnp.asarray(a).dtype, jnp.floating) else a, tree)
    model = to64(model32)
    cm = to64(system32.params[1])
    system = make_multibody_system(
        model, cm, cfg.dt, contact_iters=iters,
        force_params=ContactForceParams(smooth_width=cfg.smooth_width))
    return system, model, cm, cfg


def test_kinova_step_matches_independent_mirror():
    """The MANIPULATION physics class (fixed-base arm + welded gripper
    with box finger pads + free ball: 21 bodies, 127 contacts across
    sphere-halfspace / sphere-sphere / sphere-box / box-face pairs)
    against the same from-scratch D'Alembert + FD-Jacobian mirror, per
    step along a 10-step approach snippet."""
    import dataclasses

    from drake_ddp_tpu.examples import kinova_gen3 as kg
    from drake_ddp_tpu.multibody.algorithms import gravity_compensation

    system, model, cm, cfg = _kinova_system_f64()
    mirror = _cheetah_mirror(model, cm, cfg)   # same extractor
    # add the pair groups the cheetah scene doesn't have
    mirror.c.update(pair_ss_a=cm.pair_ss_a, pair_ss_b=cm.pair_ss_b,
                    ss_K=np.asarray(cm.ss_K, float),
                    ss_d=np.asarray(cm.ss_d, float),
                    ss_mu=np.asarray(cm.ss_mu, float))

    x0, _ = kg.scenario_states(cfg)
    x = np.asarray(x0, float)
    u0 = np.asarray(gravity_compensation(
        model, jnp.asarray(x[:model.nq], jnp.float64)), float)
    step = jax.jit(system.bound_step())
    rng = np.random.default_rng(11)
    worst = 0.0
    for t in range(10):
        u = u0 + 0.1 * rng.standard_normal(len(u0))
        x_jax = np.asarray(step(jnp.asarray(x), jnp.asarray(u)))
        x_np = mirror.step(x, u)
        err = float(np.abs(x_jax - x_np).max())
        worst = max(worst, err)
        assert err < 5e-5, (t, err, int(np.argmax(np.abs(x_jax - x_np))))
        x = x_jax
    assert worst < 5e-5
