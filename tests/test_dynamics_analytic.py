"""Unit tests for analytic dynamics models (SURVEY.md §4 layer (a)/(b))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drake_ddp_tpu.dynamics.analytic import (
    pendulum_system,
    cart_pole_system,
    acrobot_system,
    PendulumParams,
)


def finite_diff_jac(f, x, eps=1e-4):
    x = np.asarray(x, float)
    cols = []
    for i in range(x.size):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        cols.append((np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps))
    return np.stack(cols, axis=-1)


@pytest.mark.parametrize(
    "factory,n,m",
    [(pendulum_system, 2, 1), (cart_pole_system, 4, 1), (acrobot_system, 4, 1)],
)
def test_jacfwd_matches_finite_differences(factory, n, m):
    sys = factory(dt=0.01)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)
    u = jnp.asarray(rng.normal(size=m), jnp.float32)
    fx, fu = sys.linearize(x, u)
    f = sys.bound_step()
    fx_fd = finite_diff_jac(lambda xx: f(jnp.asarray(xx, jnp.float32), u), np.asarray(x))
    fu_fd = finite_diff_jac(lambda uu: f(x, jnp.asarray(uu, jnp.float32)), np.asarray(u))
    np.testing.assert_allclose(np.asarray(fx), fx_fd, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(fu), fu_fd, atol=2e-3, rtol=1e-2)


def test_pendulum_energy_conservation_undamped():
    p = PendulumParams(damping=0.0)
    dt = 1e-4
    sys = pendulum_system(dt=dt, params=p)

    def energy(x):
        theta, td = x[0], x[1]
        return (
            0.5 * p.mass * p.length**2 * td**2
            - p.mass * p.gravity * p.length * jnp.cos(theta)
        )

    x = jnp.array([1.0, 0.0])
    u = jnp.zeros((2000, 1))
    traj = sys.rollout(x, u)
    e0 = float(energy(traj[0]))
    ef = float(energy(traj[-1]))
    assert abs(ef - e0) < 2e-2 * abs(e0) + 1e-3


def test_cart_pole_equilibrium_down():
    sys = cart_pole_system(dt=0.01)
    x = jnp.zeros(4)
    traj = sys.rollout(x, jnp.zeros((100, 1)))
    np.testing.assert_allclose(np.asarray(traj[-1]), np.zeros(4), atol=1e-6)


def test_cart_pole_falls_from_upright_perturbation():
    sys = cart_pole_system(dt=0.01)
    x = jnp.array([0.0, np.pi - 0.01, 0.0, 0.0])
    traj = sys.rollout(x, jnp.zeros((200, 1)))
    # pole should fall away from upright
    assert abs(float(traj[-1][1]) - np.pi) > 0.5


def test_acrobot_gravity_pulls_down():
    sys = acrobot_system(dt=0.004)
    x = jnp.array([0.5, 0.0, 0.0, 0.0])
    traj = sys.rollout(x, jnp.zeros((50, 1)))
    # released from an angle, the first joint should accelerate toward 0
    assert float(traj[-1][2]) < 0.0


def test_vmap_over_scenarios():
    sys = cart_pole_system(dt=0.01)
    xs = jnp.zeros((16, 4)).at[:, 1].set(jnp.linspace(0, 1, 16))
    us = jnp.zeros((16, 1))
    step_batched = jax.vmap(sys.bound_step())
    out = step_batched(xs, us)
    assert out.shape == (16, 4)
    assert bool(jnp.all(jnp.isfinite(out)))
