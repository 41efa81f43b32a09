"""Lane-major (batch-last) step equivalence vs the vmapped per-scenario
step (multibody/lanestep.py vs multibody/plant.py).

The two implementations are the same math with different reduction
orders; through the stiff implicit contact solve f32 rounding amplifies
to ~1e-3 on velocities for BOTH (each vs the f64 truth).  So the pin is:
(a) exact agreement in f64, and (b) in f32, the lane step must sit as
close to the f64 truth as the per-scenario step does (within 3x)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _compare(system, xb, ub, rtol=1e-5, atol=1e-5):
    # f64 tolerance is 1e-5, not machine-eps: model constants are stored
    # f32, and the two paths round derived constants (e.g. axis cross-
    # product matrices) at different precisions before promoting.
    step_T = system.lane_step_fn  # built by make_multibody_system with
    assert step_T is not None     # the exact same contact parameters

    # (a) f64: identical roots
    x64, u64 = jnp.asarray(xb, jnp.float64), jnp.asarray(ub, jnp.float64)
    ref64 = jax.vmap(system.step)(x64, u64)
    out64 = step_T(x64.T, u64.T).T
    np.testing.assert_allclose(np.asarray(out64), np.asarray(ref64),
                               rtol=rtol, atol=atol)

    # (b) f32: no worse than the per-scenario step's own f32 error
    x32, u32 = jnp.asarray(xb, jnp.float32), jnp.asarray(ub, jnp.float32)
    ref32 = np.asarray(jax.vmap(system.step)(x32, u32))
    out32 = np.asarray(step_T(x32.T, u32.T).T)
    truth = np.asarray(ref64)
    e_scalar = np.abs(ref32 - truth).max()
    e_lane = np.abs(out32 - truth).max()
    assert e_lane <= 3.0 * e_scalar + 1e-5, (e_lane, e_scalar)


def test_lane_step_matches_cheetah():
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    rng = np.random.default_rng(0)
    B = 8
    xb = np.tile(np.asarray(x0, np.float64), (B, 1))
    xb[:, 19:] += 0.2 * rng.standard_normal((B, 18))
    xb[:, 4:7] += 0.01 * rng.standard_normal((B, 3))
    ub = np.tile(np.asarray(mc.U_STAND, np.float64), (B, 1))
    ub += 0.5 * rng.standard_normal(ub.shape)
    _compare(system, xb, ub)


def test_lane_step_matches_ball_contact_types():
    """Ball-on-ground (sphere-halfspace + friction) incl. airborne and
    deeply-penetrating lanes."""
    from tests.test_contact import ball_on_ground

    system, radius, _ = ball_on_ground()
    rng = np.random.default_rng(1)
    B = 8
    zs = np.array([radius + 0.05, radius, radius - 0.003, radius - 0.01,
                   radius + 0.2, radius - 0.001, radius + 0.01, radius])
    xb = np.zeros((B, 13))
    xb[:, 0] = 1.0
    xb[:, 6] = zs
    xb[:, 7:] = 0.5 * rng.standard_normal((B, 6))
    ub = np.zeros((B, 0))
    _compare(system, xb, ub)


def test_lane_step_matches_wall_box_pairs():
    """cart_pole_with_wall exercises prismatic joints + sphere-box pairs."""
    from drake_ddp_tpu.examples import cart_pole_with_wall as cw

    cfg = cw.Config()
    system = cw.build_system(cfg)
    rng = np.random.default_rng(2)
    B = 8
    xb = 0.3 * rng.standard_normal((B, system.n))
    ub = 2.0 * rng.standard_normal((B, system.m))
    _compare(system, xb, ub)


def test_lane_step_matches_kinova_sphere_sphere():
    """kinova scene exercises sphere-sphere pairs (arm vs ball)."""
    from drake_ddp_tpu.examples import kinova_gen3 as kg
    from drake_ddp_tpu.multibody.model import FREE

    cfg = kg.Config()
    system, model = kg.build_system(cfg)
    x0, _x_nom = kg.scenario_states(cfg)
    rng = np.random.default_rng(3)
    B = 4
    xb = np.tile(np.asarray(x0, np.float64), (B, 1))
    xb += 0.02 * rng.standard_normal(xb.shape)
    for b in range(model.nb):
        if model.joint_type[b] == FREE:
            qs = model.q_start[b]
            quat = xb[:, qs:qs + 4]
            xb[:, qs:qs + 4] = quat / np.linalg.norm(quat, axis=1,
                                                     keepdims=True)
    ub = rng.standard_normal((B, system.m))
    _compare(system, xb, ub)
