"""Opt-in box-face patch contacts vs body spheres (bs pairs).

Drake integrates hydroelastic pressure over the contact patch; the
default here approximates sphere-box contact by one closest-point
quadratic-law contact.  ``build_contact_model(box_face_quadrature=True)``
replaces each body-box-vs-sphere candidate with the bh-style 8-corner
elastic-foundation quadrature (contact/geometry.py bs section).

Measured applicability (recorded in the geometry docstring): the
quadrature is the better model in the locally-flat regime (sphere
radius >> box extent — it adds patch TORQUE a point contact cannot
carry), but UNDER-samples the nearest point when the box is small
relative to the sphere's curvature sag (ball r=0.05 on a
0.04 x 0.04 x 0.004 pad: sag ~1.2 mm exceeds the sub-mm penetration
scale and the ball settles ~4 mm low) — which is why the default, and
the kinova/panda examples, keep the point model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.contact.geometry import (BOX, SPHERE,
                                            CollisionGeometry,
                                            ContactProps, GeometrySet,
                                            build_contact_model)
from drake_ddp_tpu.multibody.model import FIXED, FREE, ModelBuilder
from drake_ddp_tpu.multibody.plant import make_multibody_system

PROPS = ContactProps(modulus=5e6, dissipation=5.0, mu_static=0.5,
                     mu_dynamic=0.5)


def _pad_on_ball(quad, r=0.5, dtype=jnp.float64):
    """FREE thin pad resting on a big FIXED ball (locally flat)."""
    mb = ModelBuilder()
    ball = mb.add_body("ball", -1, FIXED)
    pad = mb.add_body("pad", -1, FREE, mass=0.05,
                      inertia=np.eye(3) * 2e-5)
    gs = GeometrySet()
    gs.add(CollisionGeometry(pad, BOX, np.zeros(3), np.eye(3),
                             np.array([0.02, 0.02, 0.002]), PROPS))
    gs.add(CollisionGeometry(ball, SPHERE, np.array([0.0, 0.0, -r]),
                             np.eye(3), np.array([r]), PROPS))
    model = mb.finalize(dtype)
    cm = build_contact_model(gs, dtype=dtype, box_face_quadrature=quad)
    system = make_multibody_system(
        model, cm, 1e-2, contact_iters=8,
        force_params=ContactForceParams(smooth_width=1e-3))
    return system, model, cm


def _settle(system, x0, steps=200):
    @jax.jit
    def roll(x):
        f = lambda xc, _: (system.step(xc, jnp.zeros(0)), None)
        return jax.lax.scan(f, x, None, length=steps)[0]
    return roll(jnp.asarray(x0))


def test_quadrature_replaces_point_pairs():
    _, _, cm_pt = _pad_on_ball(False)
    _, _, cm_bs = _pad_on_ball(True)
    assert len(cm_pt.pair_sb_s) == 1 and len(cm_pt.pair_bs_b) == 0
    assert len(cm_bs.pair_sb_s) == 0 and len(cm_bs.pair_bs_b) == 1
    assert cm_pt.num_contacts == 1 and cm_bs.num_contacts == 8


def test_flat_regime_settle_parity():
    """Sphere radius >> box: both models rest the pad at the same height
    (recorded: 0.00402 point vs 0.00469 quadrature) and keep it level."""
    x0 = np.zeros(13)
    x0[:4] = [1, 0, 0, 0]
    x0[6] = 0.002 + 2e-4
    zs = {}
    for quad in (False, True):
        system, _, _ = _pad_on_ball(quad)
        xf = _settle(system, x0)
        assert bool(jnp.all(jnp.isfinite(xf)))
        zs[quad] = float(xf[6])
        assert abs(float(xf[4])) < 1e-6 and abs(float(xf[5])) < 1e-6
    assert abs(zs[True] - zs[False]) < 1.5e-3, zs


def test_patch_carries_restoring_torque():
    """The fidelity the quadrature adds: a tilted pad on the ball is
    restored toward level by the distributed corner forces; the single
    closest-point contact carries (almost) no contact torque about the
    contact normal's tangent plane, so the tilt persists far longer."""
    x0 = np.zeros(13)
    x0[:4] = [np.cos(0.05), np.sin(0.05), 0.0, 0.0]   # 0.1 rad roll
    x0[6] = 0.002 + 2e-4
    tilt = {}
    for quad in (False, True):
        system, _, _ = _pad_on_ball(quad)
        xf = _settle(system, x0, steps=150)
        assert bool(jnp.all(jnp.isfinite(xf)))
        tilt[quad] = abs(float(xf[1]))                 # residual roll quat
    # quadrature flattens the pad; the point contact leaves a
    # substantially larger residual tilt
    assert tilt[True] < 0.3 * tilt[False], tilt


def test_lane_twin_matches_scalar_step():
    """The lane-major narrowphase twin (lanestep bs block) matches the
    scalar plant step on the quadrature scene — the same per-step twin
    pin as test_lanestep (~1e-5 f32; exact f64)."""
    system, model, cm = _pad_on_ball(True)
    lane = system.lane_step_fn
    rng = np.random.default_rng(0)
    B = 5
    xb = np.zeros((B, 13))
    xb[:, :4] = [1, 0, 0, 0]
    xb[:, :4] += 0.05 * rng.standard_normal((B, 4))
    xb[:, :4] /= np.linalg.norm(xb[:, :4], axis=1, keepdims=True)
    xb[:, 6] = 0.002 + 0.001 * rng.standard_normal(B).clip(-1, 1) * 0.5
    xb[:, 7:] = 0.2 * rng.standard_normal((B, 6))
    x64 = jnp.asarray(xb)
    ref = jax.vmap(lambda x: system.step(x, jnp.zeros(0)))(x64)
    got = lane(x64.T, jnp.zeros((0, B), x64.dtype)).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-9, atol=1e-11)


def test_quadrature_differentiates():
    """jacfwd through the bs step (the IFT path) is finite, and the
    structured-IFT lane jac builds for the scene."""
    system, model, cm = _pad_on_ball(True)
    x = np.zeros(13)
    x[:4] = [1, 0, 0, 0]
    x[6] = 0.002 + 2e-4
    fx, fu = system.linearize(jnp.asarray(x), jnp.zeros(0))
    assert bool(jnp.all(jnp.isfinite(fx)))
    assert system.lane_jac_fn is not None
    fxl, _ = system.lane_jac_fn(jnp.asarray(x)[:, None],
                                jnp.zeros((0, 1)))
    np.testing.assert_allclose(np.asarray(fxl[..., 0]), np.asarray(fx),
                               rtol=1e-6, atol=1e-8)
