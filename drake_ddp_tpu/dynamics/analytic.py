"""Hand-derived analytic multibody models for the classic benchmark tasks.

The reference gets these models by parsing Drake's installed URDF/SDF files
(pendulum.py:41, cart_pole.py:53, acrobot.py:52) and stepping a discrete
MultibodyPlant.  Here they are closed-form Lagrangian dynamics with the same
physical parameters as Drake's example models, integrated with the same
semi-implicit Euler scheme Drake's discrete plant uses (velocities updated
from forces at (q_t, v_t); positions updated with the *new* velocities):

    v' = v + dt * M(q)^{-1} (B u + tau_g(q) - C(q,v) v - D v)
    q' = q + dt * v'

Each factory returns a :class:`DiscreteSystem` whose step function is pure
JAX — jit/vmap/jacfwd-compatible, so a whole trajectory (or a 10k-scenario
batch) of Jacobians is one compiled call.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.utils.linalg import solve_spd


def _semi_implicit_euler(q, v, vdot, dt):
    v_next = v + dt * vdot
    q_next = q + dt * v_next
    return jnp.concatenate([q_next, v_next])


# ---------------------------------------------------------------------------
# Pendulum — parameters of drake/examples/pendulum (mass 1.0 kg, length
# 0.5 m, viscous damping 0.1, g = 9.81), the model the reference loads at
# pendulum.py:41.  State x = [theta, theta_dot], theta = 0 hanging down.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PendulumParams:
    mass: float = 1.0
    length: float = 0.5
    damping: float = 0.1
    gravity: float = 9.81


def pendulum_system(dt: float, params: PendulumParams | None = None) -> DiscreteSystem:
    p = params or PendulumParams()

    def step(params: PendulumParams, x, u):
        theta, theta_dot = x[0], x[1]
        m, l, b, g = params.mass, params.length, params.damping, params.gravity
        theta_dd = (u[0] - b * theta_dot - m * g * l * jnp.sin(theta)) / (m * l * l)
        return _semi_implicit_euler(x[:1], x[1:], jnp.stack([theta_dd]), dt)

    return DiscreteSystem(step_fn=step, params=p, n=2, m=1, dt=dt)


# ---------------------------------------------------------------------------
# Cart-pole — parameters of drake/examples/multibody/cart_pole/cart_pole.sdf
# (cart 10 kg, point-mass pole 1 kg at 0.5 m), the model the reference loads
# at cart_pole.py:53 and cart_pole_with_wall.py:60.
# State x = [cart_pos, pole_angle, cart_vel, pole_vel]; angle 0 = hanging
# down, pi = upright (matches the reference's x_nom, cart_pole.py:36).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CartPoleParams:
    cart_mass: float = 10.0
    pole_mass: float = 1.0
    pole_length: float = 0.5
    gravity: float = 9.81


def cart_pole_system(dt: float, params: CartPoleParams | None = None) -> DiscreteSystem:
    p = params or CartPoleParams()

    def step(params: CartPoleParams, x, u):
        mc, mp, l, g = (
            params.cart_mass,
            params.pole_mass,
            params.pole_length,
            params.gravity,
        )
        q, v = x[:2], x[2:]
        s, c = jnp.sin(q[1]), jnp.cos(q[1])
        M = jnp.array([
            [mc + mp, mp * l * c],
            [mp * l * c, mp * l * l],
        ])
        bias = jnp.array([
            -mp * l * v[1] * v[1] * s,          # centrifugal on cart
            mp * g * l * s,                      # gravity torque on pole
        ])
        tau = jnp.array([u[0], 0.0])
        vdot = solve_spd(M, tau - bias)
        return _semi_implicit_euler(q, v, vdot, dt)

    return DiscreteSystem(step_fn=step, params=p, n=4, m=1, dt=dt)


# ---------------------------------------------------------------------------
# Acrobot — parameters of drake/examples/acrobot/Acrobot.urdf (the classic
# Spong model: m1=m2=1, l1=1, l2=2, lc1=0.5, lc2=1, Ic1=0.083, Ic2=0.33,
# b1=b2=0.1), the model the reference loads at acrobot.py:52.  Only the
# elbow (joint 2) is actuated.  State x = [q1, q2, v1, v2], q measured from
# hanging down.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AcrobotParams:
    m1: float = 1.0
    m2: float = 1.0
    l1: float = 1.0
    l2: float = 2.0
    lc1: float = 0.5
    lc2: float = 1.0
    Ic1: float = 0.083
    Ic2: float = 0.33
    b1: float = 0.1
    b2: float = 0.1
    gravity: float = 9.81


def acrobot_system(dt: float, params: AcrobotParams | None = None) -> DiscreteSystem:
    p = params or AcrobotParams()

    def step(params: AcrobotParams, x, u):
        q, v = x[:2], x[2:]
        q1, q2 = q[0], q[1]
        v1, v2 = v[0], v[1]
        m1, m2 = params.m1, params.m2
        l1 = params.l1
        lc1, lc2 = params.lc1, params.lc2
        g = params.gravity
        I1 = params.Ic1 + m1 * lc1 * lc1
        I2 = params.Ic2 + m2 * lc2 * lc2
        s1, s2 = jnp.sin(q1), jnp.sin(q2)
        c2 = jnp.cos(q2)
        s12 = jnp.sin(q1 + q2)

        m2l1lc2 = m2 * l1 * lc2
        M = jnp.array([
            [I1 + I2 + m2 * l1 * l1 + 2 * m2l1lc2 * c2, I2 + m2l1lc2 * c2],
            [I2 + m2l1lc2 * c2, I2],
        ])
        # Coriolis matrix times v, plus joint damping
        C_v = jnp.array([
            -2 * m2l1lc2 * s2 * v2 * v1 - m2l1lc2 * s2 * v2 * v2 + params.b1 * v1,
            m2l1lc2 * s2 * v1 * v1 + params.b2 * v2,
        ])
        tau_g = jnp.array([
            -(m1 * g * lc1 * s1 + m2 * g * (l1 * s1 + lc2 * s12)),
            -m2 * g * lc2 * s12,
        ])
        tau = jnp.array([0.0, u[0]])
        vdot = solve_spd(M, tau + tau_g - C_v)
        return _semi_implicit_euler(q, v, vdot, dt)

    return DiscreteSystem(step_fn=step, params=p, n=4, m=1, dt=dt)
