"""SDF parser (io/sdf.py): frame lowering + dynamics parity.

The strongest check available without Drake: building the cart-pole from
the SDF replica (models/cart_pole.sdf, the file the reference loads at
cart_pole.py:53) must step IDENTICALLY to the hand-derived analytic
cart-pole (dynamics/analytic.py), which is itself validated against the
f64 NumPy mirror.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drake_ddp_tpu.contact.geometry import GeometrySet
from drake_ddp_tpu.dynamics.analytic import cart_pole_system
from drake_ddp_tpu.io.sdf import add_sdf, parse_sdf
from drake_ddp_tpu.multibody.model import ModelBuilder, PRISMATIC, REVOLUTE
from drake_ddp_tpu.multibody.plant import make_multibody_system

SDF_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "drake_ddp_tpu", "models", "cart_pole.sdf")


def _build_sdf_cart_pole(dt=1e-2):
    robot = parse_sdf(SDF_PATH)
    mb = ModelBuilder()
    gs = GeometrySet()
    add_sdf(mb, gs, robot)
    model = mb.finalize()
    return model, make_multibody_system(model, None, dt)


def test_parse_cart_pole_structure():
    robot = parse_sdf(SDF_PATH)
    assert robot.root is None  # world-rooted via CartSlider
    assert [j.type for j in robot.joints] == ["prismatic", "revolute"]
    slider, pin = robot.joints
    assert slider.parent == "world" and slider.child == "Cart"
    assert slider.actuated and not pin.actuated  # Drake effort rule
    np.testing.assert_allclose(pin.axis, [0, -1, 0])
    pole = robot.links["Pole"]
    assert pole.mass == 1.0
    np.testing.assert_allclose(pole.com, [0, 0, -0.5])
    # the collision pose composes the link->collision offset
    assert pole.collisions[0].kind == "sphere"
    np.testing.assert_allclose(pole.collisions[0].pos, [0, 0, -0.5])


def test_sdf_model_layout():
    model, sys_ = _build_sdf_cart_pole()
    assert model.nq == 2 and model.nv == 2 and model.nu == 1
    assert tuple(model.joint_type) == (PRISMATIC, REVOLUTE)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sdf_cart_pole_matches_analytic(seed):
    """Multibody plant built from the SDF == hand-derived analytic
    cart-pole, step for step."""
    dt = 1e-2
    model, sys_sdf = _build_sdf_cart_pole(dt)
    sys_ref = cart_pole_system(dt=dt)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(scale=0.7, size=4), jnp.float32)
    u = jnp.asarray(rng.normal(scale=2.0, size=1), jnp.float32)
    step_sdf = sys_sdf.bound_step()
    step_ref = sys_ref.bound_step()
    for _ in range(20):
        x_sdf = step_sdf(x, u)
        x_ref = step_ref(x, u)
        np.testing.assert_allclose(np.asarray(x_sdf), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)
        x = x_ref


def test_sdf_swingup_solves():
    """iLQR swing-up on the SDF-built plant reaches the upright state
    (the reference's cart_pole.py task through the SDF path)."""
    from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator

    dt, N = 1e-2, 200
    _, sys_ = _build_sdf_cart_pole(dt)
    # beta=0.9 is the example's linesearch config (examples/cart_pole.py)
    ilqr = IterativeLinearQuadraticRegulator(sys_, N, beta=0.9,
                                             verbose=False)
    ilqr.SetInitialState(np.zeros(4))
    ilqr.SetTargetState(np.array([0.0, np.pi, 0.0, 0.0]))
    ilqr.SetRunningCost(dt * np.diag([10.0, 10.0, 0.1, 0.1]),
                        dt * 0.001 * np.eye(1))
    ilqr.SetTerminalCost(np.diag([100.0, 100.0, 10.0, 10.0]))
    x, u, t, cost = ilqr.Solve()
    # same tolerance as the analytic-path example test (test_examples.py)
    assert abs(abs(x[1, -1]) - np.pi) < 0.2
