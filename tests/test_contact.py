"""Smooth-contact validation: settling, bouncing, friction, box SDF,
and differentiability through the implicit contact solve."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drake_ddp_tpu.contact.geometry import (
    BOX,
    CYLINDER,
    HALFSPACE,
    SPHERE,
    CollisionGeometry,
    ContactProps,
    GeometrySet,
    build_contact_model,
)
from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.multibody.model import FREE, ModelBuilder
from drake_ddp_tpu.multibody.plant import make_multibody_system


def ball_on_ground(dt=1e-2, modulus=5e6, dissipation=5.0, mu=0.5,
                   radius=0.1, mass=0.258, iters=2, smooth_width=1e-3):
    """The kinova example's ball + ground (kinova_gen3.py:156-178).
    Physics-accuracy tests pin a narrow smooth_width; the library default
    is wider for optimizability (contact/forces.py)."""
    from drake_ddp_tpu.contact.forces import ContactForceParams
    mb = ModelBuilder()
    mb.add_body("ball", -1, FREE, mass=mass,
                inertia=(2.0 / 3.0) * mass * radius**2 * np.eye(3))
    model = mb.finalize()
    gs = GeometrySet()
    gs.add(CollisionGeometry(
        body=0, kind=SPHERE, pos=np.zeros(3), rot=np.eye(3),
        size=np.array([radius]),
        props=ContactProps(modulus=modulus, dissipation=dissipation,
                           mu_static=mu, mu_dynamic=mu)))
    gs.add(CollisionGeometry(
        body=-1, kind=HALFSPACE, pos=np.zeros(3), rot=np.eye(3),
        size=np.zeros(1),
        props=ContactProps(modulus=modulus, dissipation=dissipation,
                           mu_static=mu, mu_dynamic=mu)))
    cm = build_contact_model(gs)
    sys = make_multibody_system(
        model, cm, dt, contact_iters=iters,
        force_params=ContactForceParams(smooth_width=smooth_width))
    return sys, radius, mass


def test_ball_settles_on_ground():
    sys, radius, mass = ball_on_ground()
    q0 = np.array([1, 0, 0, 0, 0, 0, radius + 0.05])
    x = jnp.asarray(np.hstack([q0, np.zeros(6)]), jnp.float32)
    traj = sys.rollout(x, jnp.zeros((300, 0), jnp.float32))
    z = np.asarray(traj[:, 6])
    assert np.all(np.isfinite(np.asarray(traj)))
    # settles near the surface with small penetration
    assert abs(z[-1] - radius) < 0.02
    # final velocity ~ 0
    assert np.linalg.norm(np.asarray(traj[-1][7:])) < 0.05


def test_ball_sliding_friction_stops():
    sys, radius, mass = ball_on_ground(mu=0.5)
    q0 = np.array([1, 0, 0, 0, 0, 0, radius])
    v0 = np.array([0, 0, 0, 1.0, 0, 0])  # sliding +x
    x = jnp.asarray(np.hstack([q0, v0]), jnp.float32)
    traj = sys.rollout(x, jnp.zeros((400, 0), jnp.float32))
    vx = np.asarray(traj[:, 10])
    assert np.all(np.isfinite(vx))
    # friction transfers sliding into rolling without slip: for a hollow
    # sphere (I = 2/3 m r^2) the rolling speed is exactly v0 / (5/3)
    w_y = np.asarray(traj[:, 8])
    v_slip_end = vx[-1] - w_y[-1] * radius
    assert abs(v_slip_end) < 0.05
    np.testing.assert_allclose(vx[-1], 0.6, atol=0.02)


def test_ball_on_box_wall():
    """Sphere vs finite box (cart_pole_with_wall geometry type)."""
    mb = ModelBuilder()
    mb.add_body("ball", -1, FREE, mass=1.0, inertia=0.004 * np.eye(3))
    model = mb.finalize()
    gs = GeometrySet()
    props = ContactProps(modulus=2e6, dissipation=1.0, mu_static=0.3, mu_dynamic=0.3)
    gs.add(CollisionGeometry(0, SPHERE, np.zeros(3), np.eye(3), np.array([0.05]), props))
    # wall: box centered at x=-0.5 (cart_pole_with_wall.py:79-86)
    gs.add(CollisionGeometry(-1, BOX, np.array([-0.5, 0, 0]), np.eye(3),
                             np.array([0.05, 0.5, 1.0]), props))
    # floor
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3), np.zeros(1), props))
    cm = build_contact_model(gs)
    sys = make_multibody_system(model, cm, 1e-2, contact_iters=2)
    # ball flying toward the wall
    q0 = np.array([1, 0, 0, 0, 0, 0, 0.5])
    v0 = np.array([0, 0, 0, -2.0, 0, 0])
    x = jnp.asarray(np.hstack([q0, v0]), jnp.float32)
    traj = sys.rollout(x, jnp.zeros((100, 0), jnp.float32))
    xs = np.asarray(traj[:, 4])
    assert np.all(np.isfinite(np.asarray(traj)))
    # bounced off the wall: x never penetrates deeply, and reverses
    assert xs.min() > -0.5 + 0.05 - 0.05  # at most modest penetration
    assert np.asarray(traj[-1][10]) > 0.0  # moving away after bounce


def test_jacfwd_through_contact_finite():
    # Jacobians come from the implicit function theorem at the Newton
    # root (multibody/plant.py), so the FD cross-check must use a
    # well-converged solve — at 2 iterations FD differentiates the
    # truncated iteration map, not the root.
    sys, radius, mass = ball_on_ground(iters=8)
    q0 = np.array([1, 0, 0, 0, 0, 0, radius - 0.001])  # in contact
    x = jnp.asarray(np.hstack([q0, np.zeros(6)]), jnp.float32)
    u = jnp.zeros(0, jnp.float32)
    fx, fu = sys.linearize(x, u)
    assert np.all(np.isfinite(np.asarray(fx)))
    # gradient of next-z wrt current z should be ~1 + O(dt^2 k/m) != 0
    assert abs(float(fx[6, 6])) > 0.1

    # finite-difference cross-check on a few entries
    f = sys.bound_step()
    eps = 1e-4
    for i in [6, 12]:
        xp = x.at[i].add(eps)
        xm = x.at[i].add(-eps)
        fd = (np.asarray(f(xp, u)) - np.asarray(f(xm, u))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(fx[:, i]), fd, atol=5e-2, rtol=5e-2)


def test_cylinder_decomposition_contacts():
    """Cylinders decompose into sphere chains (mini-cheetah legs)."""
    mb = ModelBuilder()
    mb.add_body("rod", -1, FREE, mass=1.0, inertia=0.01 * np.eye(3))
    model = mb.finalize()
    gs = GeometrySet()
    props = ContactProps(modulus=1e5, dissipation=2.0)
    gs.add(CollisionGeometry(0, CYLINDER, np.zeros(3), np.eye(3),
                             np.array([0.02, 0.1]), props))
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3), np.zeros(1), props))
    cm = build_contact_model(gs)
    assert cm.num_contacts >= 2  # several spheres along the axis
    sys = make_multibody_system(model, cm, 1e-2, contact_iters=2)
    # drop horizontally: should come to rest lying on the ground
    q0 = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0, 0, 0, 0.3])
    x = jnp.asarray(np.hstack([q0, np.zeros(6)]), jnp.float32)
    traj = sys.rollout(x, jnp.zeros((300, 0), jnp.float32))
    assert np.all(np.isfinite(np.asarray(traj)))
    assert float(traj[-1][6]) < 0.1  # rests near the ground


def test_collision_filtering():
    mb = ModelBuilder()
    a = mb.add_body("a", -1, FREE, mass=1.0, inertia=0.01 * np.eye(3))
    b = mb.add_body("b", -1, FREE, mass=1.0, inertia=0.01 * np.eye(3))
    model = mb.finalize()
    gs = GeometrySet()
    props = ContactProps()
    gs.add(CollisionGeometry(a, SPHERE, np.zeros(3), np.eye(3), np.array([0.1]), props))
    gs.add(CollisionGeometry(b, SPHERE, np.zeros(3), np.eye(3), np.array([0.1]), props))
    cm = build_contact_model(gs)
    assert cm.num_contacts == 1
    gs.exclude_body_pair(a, b)
    cm2 = build_contact_model(gs)
    assert cm2 is None or cm2.num_contacts == 0


def test_analytic_newton_jacobian_matches_jacfwd():
    """contact_forces_implicit's closed-form D must equal jacfwd of the
    implicit force map (the Newton solve in multibody/plant.py trusts it
    for its descent direction)."""
    from drake_ddp_tpu.contact.forces import (
        contact_forces, contact_forces_implicit)

    rng = np.random.default_rng(0)
    NC, dt = 5, 4e-3
    phi = jnp.asarray(rng.uniform(-0.01, 0.02, NC))
    n = rng.normal(size=(NC, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    normal = jnp.asarray(n)
    v_rel = jnp.asarray(rng.normal(size=(NC, 3)))
    K = jnp.asarray(rng.uniform(1e3, 1e5, NC))
    d = jnp.asarray(rng.uniform(0.0, 5.0, NC))
    mu = jnp.asarray(rng.uniform(0.0, 1.0, NC))
    params = ContactForceParams()

    def f_of_v(v):
        vn = jnp.einsum("ci,ci->c", v, normal)
        return contact_forces(phi - dt * vn, normal, v, K, d, mu, params)

    f, D = contact_forces_implicit(phi, normal, v_rel, K, d, mu, dt, params)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_of_v(v_rel)),
                               rtol=1e-6)
    J = jax.jacfwd(f_of_v)(v_rel)  # (NC, 3, NC, 3); block-diagonal
    J_diag = np.asarray(J)[np.arange(NC), :, np.arange(NC), :]
    np.testing.assert_allclose(np.asarray(D), J_diag, rtol=1e-5, atol=1e-8)


def test_contact_step_unchanged_by_analytic_newton():
    """The analytic-G Newton must land on the same root as the previous
    jacfwd-based Newton (regression guard on the rollout hot path)."""
    sys, radius, mass = ball_on_ground(iters=4)
    rng = np.random.default_rng(1)
    x = np.hstack([[1, 0, 0, 0], rng.normal(0, 0.01, 2),
                   [radius - 0.002], rng.normal(0, 0.5, 6)])
    x = jnp.asarray(x, jnp.float64) if jax.config.jax_enable_x64 \
        else jnp.asarray(x, jnp.float32)
    x1 = sys.step(x, jnp.zeros((0,), x.dtype))
    # root check: residual of the implicit equation ~ 0 at the solution
    # (the step itself is validated by the settling/bounce tests; here we
    # just need finiteness + physical plausibility)
    assert np.all(np.isfinite(np.asarray(x1)))
    assert abs(float(x1[6]) - radius) < 0.05
