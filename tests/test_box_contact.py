"""Box-face, world-sphere, and capsule contact (SURVEY.md D3 upgrade).

The reference's hydroelastic engine supports flat face-on-face contact
(e.g. Drake boxes resting on the ground).  The TPU-native model keeps
body-attached boxes analytic: 8 corner point-contacts against a world
halfspace with a LINEAR elastic-foundation law fn = K1*phi (K1 = g_eff *
A_proj/4, geometry.py bh pairs) — exact corner quadrature of the linear
hydroelastic pressure over a fully-contacting face.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.contact.geometry import (
    BOX,
    CAPSULE,
    HALFSPACE,
    SPHERE,
    CollisionGeometry,
    ContactProps,
    GeometrySet,
    _decompose_to_spheres,
    build_contact_model,
    narrowphase,
)
from drake_ddp_tpu.multibody.model import FIXED, FREE, ModelBuilder
from drake_ddp_tpu.multibody.plant import make_multibody_system


def _free_box_system(half=(0.1, 0.1, 0.05), mass=1.0, dt=5e-3,
                     dissipation=1.0, contact_iters=4):
    mb = ModelBuilder()
    h = np.asarray(half)
    I = mass / 3.0 * np.diag([h[1] ** 2 + h[2] ** 2,
                              h[0] ** 2 + h[2] ** 2,
                              h[0] ** 2 + h[1] ** 2])
    body = mb.add_body("box", -1, FREE, mass=mass, inertia=I)
    model = mb.finalize()
    gs = GeometrySet()
    props = ContactProps(modulus=5e6, dissipation=dissipation)
    gs.add(CollisionGeometry(body, BOX, np.zeros(3), np.eye(3), h, props))
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3),
                             np.array([0.5]), ContactProps(modulus=5e6)))
    cm = build_contact_model(gs)
    sys_ = make_multibody_system(model, cm, dt, contact_iters=contact_iters)
    return model, cm, sys_


def _rollout(sys_, x0, steps):
    step = sys_.bound_step()
    u = jnp.zeros((sys_.m,), jnp.float32)

    def body(x, _):
        xn = step(x, u)
        return xn, None

    xf, _ = jax.lax.scan(body, x0, None, length=steps)
    return xf


def _expected_rest_phi(cm, mass=1.0, half=(0.1, 0.1, 0.05)):
    """Force balance: 4 corners * K1 * softplus(phi/w)*w = m g."""
    params = ContactForceParams()
    g_eff = float(cm.bh_g[0])
    a_proj = 4.0 * half[0] * half[1]
    K1 = g_eff * a_proj / 4.0
    w = params.smooth_width
    target = mass * 9.81 / (4.0 * K1)
    return w * np.log(np.expm1(target / w))


def test_box_rests_flat_on_ground():
    """A free box dropped 1 cm above compliant ground settles flat at the
    smooth-force-balance height under the implicit contact solve."""
    half = (0.1, 0.1, 0.05)
    model, cm, sys_ = _free_box_system(half=half)
    assert len(cm.pair_bh_b) == 1 and cm.num_contacts == 8

    x0 = jnp.zeros(13, jnp.float32).at[0].set(1.0).at[6].set(half[2] + 0.01)
    xf = np.asarray(_rollout(sys_, x0, 400))  # 2.0 s

    # settled: velocities ~ 0, no fall-through, no blow-up
    assert np.all(np.isfinite(xf))
    assert np.linalg.norm(xf[7:]) < 2e-2, xf[7:]
    # flat: quaternion still ~ identity
    assert abs(abs(xf[0]) - 1.0) < 1e-3 and np.linalg.norm(xf[1:4]) < 1e-2
    # resting height equals the analytic smooth force balance
    phi_rest = _expected_rest_phi(cm, half=half)
    z_expected = half[2] - phi_rest
    assert abs(float(xf[6]) - z_expected) < 1e-3, (xf[6], z_expected)


def test_tilted_box_settles_flat():
    half = (0.1, 0.1, 0.05)
    model, cm, sys_ = _free_box_system(half=half)
    ang = 0.15
    x0 = jnp.zeros(13, jnp.float32)
    x0 = x0.at[0].set(np.cos(ang / 2)).at[1].set(np.sin(ang / 2))
    x0 = x0.at[6].set(half[2] + 0.02)
    xf = np.asarray(_rollout(sys_, x0, 600))  # 3.0 s
    assert np.all(np.isfinite(xf))
    # tilt decayed: rotation is ~ identity again (gravity + dissipation)
    tilt = 2.0 * np.arcsin(min(1.0, np.linalg.norm(xf[1:4])))
    assert tilt < 0.03, tilt
    assert np.linalg.norm(xf[7:]) < 5e-2


def test_box_face_force_matches_foundation_law():
    """Uniform penetration phi -> total normal force g_eff * A * phi
    (in the deep-contact regime where softplus(phi) ~ phi)."""
    half = (0.1, 0.1, 0.05)
    model, cm, sys_ = _free_box_system(half=half)
    phi_u = 0.02  # >> smooth_width: softplus is identity here
    centers = jnp.zeros((0, 3), jnp.float32)
    R = jnp.eye(3, dtype=jnp.float32)[None]
    p = jnp.asarray([[0.0, 0.0, half[2] - phi_u]], jnp.float32)
    phi, normal, point, ba, bb, K, K1, d, mu = narrowphase(
        cm, centers, body_R=R, body_p=p)
    assert phi.shape == (8,)
    # bottom corners at phi_u, top corners at phi_u - 2*hz (separated)
    np.testing.assert_allclose(np.sort(np.asarray(phi))[-4:], phi_u, atol=1e-6)
    from drake_ddp_tpu.contact.forces import contact_forces

    f = contact_forces(phi, normal, jnp.zeros((8, 3), jnp.float32),
                       K, d, mu, K1=K1)
    total = float(jnp.sum(f[:, 2]))
    g_eff = float(cm.bh_g[0])
    area = 4.0 * half[0] * half[1]
    np.testing.assert_allclose(total, g_eff * area * phi_u, rtol=2e-2)


def test_box_contact_derivatives_finite():
    """jacfwd through the box-contact implicit step is finite and matches
    finite differences (IFT path through the new force law).  IFT
    differentiates the ROOT, so the solve must be well converged
    (contact_iters=16 at this sliding state; see CLAUDE.md), and f64
    keeps the FD quotient out of the noise."""
    model, cm, sys_ = _free_box_system(contact_iters=16)
    step = sys_.bound_step()
    x0 = jnp.zeros(13, jnp.float64).at[0].set(1.0).at[6].set(0.049)
    x0 = x0.at[7].set(0.02).at[10].set(0.05)
    u = jnp.zeros((0,), jnp.float64)
    J = np.asarray(jax.jacfwd(step)(x0, u))
    assert np.all(np.isfinite(J))
    eps = 1e-6
    for i in [6, 9, 12]:
        dx = np.zeros(13)
        dx[i] = eps
        fd = (np.asarray(step(x0 + dx, u)) - np.asarray(step(x0 - dx, u))) / (2 * eps)
        np.testing.assert_allclose(J[:, i], fd, rtol=2e-2, atol=2e-3)


def test_sphere_on_body_box():
    """A free sphere rests on the top face of a box welded to a body
    (sb pair with a body-attached box)."""
    mb = ModelBuilder()
    base = mb.add_body("table", -1, FIXED, X_PJ_pos=np.array([0, 0, 0.2]))
    r = 0.03
    ball = mb.add_body("ball", -1, FREE, mass=0.1,
                       inertia=0.1 * 0.4 * r * r * np.eye(3))
    model = mb.finalize()
    gs = GeometrySet()
    gs.add(CollisionGeometry(base, BOX, np.zeros(3), np.eye(3),
                             np.array([0.2, 0.2, 0.02]),
                             ContactProps(modulus=np.inf)))
    gs.add(CollisionGeometry(ball, SPHERE, np.zeros(3), np.eye(3),
                             np.array([r]),
                             ContactProps(modulus=5e6, dissipation=2.0)))
    cm = build_contact_model(gs)
    assert len(cm.pair_sb_s) == 1 and cm.box_body[0] == base
    sys_ = make_multibody_system(model, cm, 5e-3, contact_iters=4)
    top = 0.2 + 0.02
    x0 = jnp.zeros(13, jnp.float32).at[0].set(1.0).at[6].set(top + r + 0.005)
    xf = np.asarray(_rollout(sys_, x0, 400))
    assert np.all(np.isfinite(xf))
    assert np.linalg.norm(xf[7:]) < 2e-2
    # resting on the face: center within the smoothing band of top + r
    assert abs(float(xf[6]) - (top + r)) < 1.5e-2, xf[6]


def test_world_sphere_contact():
    """Body sphere vs world-fixed sphere (previously rejected)."""
    mb = ModelBuilder()
    r = 0.05
    ball = mb.add_body("ball", -1, FREE, mass=0.1,
                       inertia=0.1 * 0.4 * r * r * np.eye(3))
    model = mb.finalize()
    gs = GeometrySet()
    gs.add(CollisionGeometry(ball, SPHERE, np.zeros(3), np.eye(3),
                             np.array([r]),
                             ContactProps(modulus=5e6, dissipation=2.0)))
    gs.add(CollisionGeometry(-1, SPHERE, np.zeros(3), np.eye(3),
                             np.array([0.5]), ContactProps(modulus=5e6)))
    cm = build_contact_model(gs)
    assert len(cm.pair_sw_s) == 1
    sys_ = make_multibody_system(model, cm, 5e-3, contact_iters=4)
    # drop the ball onto the big fixed sphere from just above
    x0 = jnp.zeros(13, jnp.float32).at[0].set(1.0).at[6].set(0.5 + r + 0.005)
    xf = np.asarray(_rollout(sys_, x0, 200))
    assert np.all(np.isfinite(xf))
    # the ball stays near the top of the fixed sphere (contact holds it;
    # it may roll off slowly only if perturbed — it isn't)
    assert float(xf[6]) > 0.5 + r - 2e-2


def test_capsule_decomposition_exact_endcaps():
    g = CollisionGeometry(0, CAPSULE, np.zeros(3), np.eye(3),
                          np.array([0.02, 0.1]))
    spheres = _decompose_to_spheres(g)
    centers = np.array([s[0] for s in spheres])
    radii = np.array([s[1] for s in spheres])
    np.testing.assert_allclose(radii, 0.02)
    # endpoint sphere centers at +-hl: caps are represented exactly
    assert np.min(centers[:, 2]) == pytest.approx(-0.1)
    assert np.max(centers[:, 2]) == pytest.approx(0.1)


def _lane_vs_scalar(sys_, x0s):
    """Assert the lane-major twin matches the scalar step on a batch."""
    step = sys_.bound_step()
    lane = sys_.lane_step_fn
    assert lane is not None
    x_T = jnp.asarray(np.stack(x0s, axis=-1), jnp.float32)   # (n, B)
    u_T = jnp.zeros((sys_.m, x_T.shape[-1]), jnp.float32)
    got = np.asarray(lane(x_T, u_T))
    want = np.stack([
        np.asarray(step(jnp.asarray(x, jnp.float32),
                        jnp.zeros((sys_.m,), jnp.float32))) for x in x0s
    ], axis=-1)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_lane_step_matches_scalar_box_face():
    """Lane-major twin of the bh (box-face) narrowphase == scalar path."""
    _, _, sys_ = _free_box_system()
    rng = np.random.default_rng(0)
    x0s = []
    for k in range(4):
        x = np.zeros(13, np.float32)
        ang = 0.2 * rng.normal()
        x[0], x[1] = np.cos(ang / 2), np.sin(ang / 2)
        x[6] = 0.05 + 0.01 * rng.normal()
        x[7:] = 0.1 * rng.normal(size=6)
        x0s.append(x)
    _lane_vs_scalar(sys_, x0s)


def test_lane_jac_matches_jacfwd_box_face():
    """Structured-IFT lane Jacobian == jacfwd through the scalar step
    for a model with box-face contact (orientation-dependent K1)."""
    _, _, sys_ = _free_box_system(contact_iters=8)
    step = sys_.bound_step()
    jac_T = sys_.lane_jac_fn
    assert jac_T is not None
    x = np.zeros(13, np.float32)
    ang = 0.1
    x[0], x[1] = np.cos(ang / 2), np.sin(ang / 2)
    x[6] = 0.052
    x[7:] = [0.05, 0.0, 0.02, 0.03, 0.0, -0.02]
    xj = jnp.asarray(x, jnp.float32)
    uj = jnp.zeros((0,), jnp.float32)
    fx_ref = np.asarray(jax.jacfwd(step, argnums=0)(xj, uj))
    fx_L, fu_L = jac_T(xj[:, None], uj[:, None])
    np.testing.assert_allclose(np.asarray(fx_L[..., 0]), fx_ref,
                               rtol=2e-3, atol=2e-3)
