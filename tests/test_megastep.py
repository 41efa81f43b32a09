"""Pallas mega-step kernel (ops/megastep.py) equivalence vs the lane
step it wraps — interpret mode on CPU; compiled-mode parity is exercised
on TPU by bench.py."""

import numpy as np
import jax
import jax.numpy as jnp

from drake_ddp_tpu.ops.megastep import pallas_step_for_system


def test_pallas_step_matches_lane_cheetah():
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    rng = np.random.default_rng(0)
    B = 16
    xb = np.tile(np.asarray(x0, np.float32), (B, 1))
    xb[:, 19:] += 0.2 * rng.standard_normal((B, 18)).astype(np.float32)
    ub = np.tile(np.asarray(mc.U_STAND, np.float32), (B, 1))
    ub += 0.5 * rng.standard_normal(ub.shape).astype(np.float32)
    x_T = jnp.asarray(xb.T)
    u_T = jnp.asarray(ub.T)

    k = pallas_step_for_system(system, block_b=8, interpret=True)
    assert k is not None
    out = k(x_T, u_T)
    ref = system.lane_step_fn(x_T, u_T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-3)


def test_pallas_step_matches_lane_passive_ball():
    from tests.test_contact import ball_on_ground

    system, radius, _ = ball_on_ground()
    B = 8
    rng = np.random.default_rng(1)
    xb = np.zeros((B, 13), np.float32)
    xb[:, 0] = 1.0
    xb[:, 6] = radius - 0.002
    xb[:, 7:] = 0.3 * rng.standard_normal((B, 6)).astype(np.float32)
    x_T = jnp.asarray(xb.T)
    u_T = jnp.zeros((0, B), jnp.float32)

    k = pallas_step_for_system(system, block_b=8, interpret=True)
    out = k(x_T, u_T)
    ref = system.lane_step_fn(x_T, u_T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-3)
