"""Multibody engine validation (SURVEY.md §7 step 4): the tree dynamics
must reproduce the hand-derived analytic models, conserve the right
quantities, and differentiate cleanly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drake_ddp_tpu.dynamics.analytic import (
    pendulum_system,
    cart_pole_system,
    acrobot_system,
    PendulumParams,
    CartPoleParams,
    AcrobotParams,
)
from drake_ddp_tpu.multibody.model import (
    FREE,
    PRISMATIC,
    REVOLUTE,
    ModelBuilder,
)
from drake_ddp_tpu.multibody.plant import make_multibody_system


def build_pendulum(dt, p: PendulumParams = PendulumParams()):
    mb = ModelBuilder()
    mb.add_body(
        "arm", -1, REVOLUTE, axis=(0, 1, 0),
        mass=p.mass, com=(0, 0, -p.length),
        inertia=np.zeros((3, 3)),
        damping=p.damping, actuated=True,
    )
    return make_multibody_system(mb.finalize(), None, dt)


def build_cart_pole(dt, p: CartPoleParams = CartPoleParams()):
    mb = ModelBuilder()
    cart = mb.add_body("cart", -1, PRISMATIC, axis=(1, 0, 0),
                       mass=p.cart_mass, actuated=True)
    mb.add_body("pole", cart, REVOLUTE, axis=(0, -1, 0),
                mass=p.pole_mass, com=(0, 0, -p.pole_length))
    return make_multibody_system(mb.finalize(), None, dt)


def build_acrobot(dt, p: AcrobotParams = AcrobotParams()):
    mb = ModelBuilder()
    l1 = mb.add_body("link1", -1, REVOLUTE, axis=(0, -1, 0),
                     mass=p.m1, com=(0, 0, -p.lc1),
                     inertia=np.diag([0.0, p.Ic1, 0.0]), damping=p.b1)
    mb.add_body("link2", l1, REVOLUTE, axis=(0, -1, 0),
                X_PJ_pos=(0, 0, -p.l1),
                mass=p.m2, com=(0, 0, -p.lc2),
                inertia=np.diag([0.0, p.Ic2, 0.0]), damping=p.b2,
                actuated=True)
    return make_multibody_system(mb.finalize(), None, dt)


@pytest.mark.parametrize(
    "mb_factory,an_factory,n,m",
    [
        (build_pendulum, pendulum_system, 2, 1),
        (build_cart_pole, cart_pole_system, 4, 1),
        (build_acrobot, acrobot_system, 4, 1),
    ],
)
def test_tree_matches_analytic(mb_factory, an_factory, n, m):
    dt = 1e-3
    mb = mb_factory(dt)
    an = an_factory(dt)
    assert mb.n == n and mb.m == m
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = jnp.asarray(rng.normal(scale=0.7, size=n), jnp.float32)
        u = jnp.asarray(rng.normal(scale=2.0, size=m), jnp.float32)
        got = np.asarray(mb.step(x, u))
        want = np.asarray(an.step(x, u))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_tree_jacobians_match_analytic():
    dt = 1e-2
    mb = build_cart_pole(dt)
    an = cart_pole_system(dt)
    x = jnp.array([0.1, 0.8, -0.3, 0.5], jnp.float32)
    u = jnp.array([2.0], jnp.float32)
    fx_mb, fu_mb = mb.linearize(x, u)
    fx_an, fu_an = an.linearize(x, u)
    np.testing.assert_allclose(np.asarray(fx_mb), np.asarray(fx_an), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fu_mb), np.asarray(fu_an), atol=2e-4)


def test_free_body_ballistic():
    """A floating body with no contact follows a parabola and conserves
    angular velocity about its principal axes (symmetric inertia)."""
    mb = ModelBuilder()
    mb.add_body("ball", -1, FREE, mass=1.0,
                inertia=0.01 * np.eye(3))
    sys = make_multibody_system(mb.finalize(), None, 1e-3)
    q0 = np.array([1, 0, 0, 0, 0, 0, 1.0])
    v0 = np.array([1.0, 2.0, 3.0, 0.5, 0.0, 2.0])
    x = jnp.asarray(np.hstack([q0, v0]), jnp.float32)
    traj = sys.rollout(x, jnp.zeros((200, 0), jnp.float32))
    T = 0.2
    # translational: p = p0 + v t + 0.5 g t^2
    p_end = np.asarray(traj[-1][4:7])
    expect = np.array([0.5 * T, 0.0 * T, 1.0 + 2.0 * T - 0.5 * 9.81 * T * T])
    np.testing.assert_allclose(p_end, expect, atol=2e-2)
    # angular velocity conserved (spherical inertia)
    np.testing.assert_allclose(np.asarray(traj[-1][7:10]), v0[:3], atol=1e-4)
    # quaternion stays unit
    assert abs(float(jnp.linalg.norm(traj[-1][:4])) - 1.0) < 1e-5


def test_floating_pendulum_energy():
    """Undamped multibody pendulum conserves energy."""
    p = PendulumParams(damping=0.0)
    sys = build_pendulum(1e-4, p)
    x = jnp.array([1.2, 0.0], jnp.float32)
    traj = sys.rollout(x, jnp.zeros((2000, 1), jnp.float32))

    def energy(x):
        th, td = float(x[0]), float(x[1])
        return 0.5 * p.mass * p.length**2 * td**2 - p.mass * 9.81 * p.length * np.cos(th)

    e0, ef = energy(traj[0]), energy(traj[-1])
    assert abs(ef - e0) < 2e-2 * abs(e0) + 1e-3
