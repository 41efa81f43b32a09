"""Pallas mega-jac kernel (ops/megajac.py) equivalence vs the XLA lane
jac it wraps — interpret mode on CPU at flagship state/control sizes
(n=37, m=12; interpret mode honors shapes), including the lane-padding
path.  Compiled-mode selection is preflight-gated in solver/batched.py
(_pallas_jac_for) so a Mosaic failure degrades 'auto' instead of
killing the bench (the r02 regression class)."""

import numpy as np
import jax
import jax.numpy as jnp

from drake_ddp_tpu.ops.megajac import pallas_jac_for_system


def _cheetah_lanes(B, seed=0):
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config(contact_iters=8)     # bench.py flagship config
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    rng = np.random.default_rng(seed)
    xb = np.tile(np.asarray(x0, np.float32), (B, 1))
    xb[:, 19:] += 0.2 * rng.standard_normal((B, 18)).astype(np.float32)
    ub = np.tile(np.asarray(mc.U_STAND, np.float32), (B, 1))
    ub += 0.5 * rng.standard_normal(ub.shape).astype(np.float32)
    return system, jnp.asarray(xb.T), jnp.asarray(ub.T)


# Tolerances: f32 op-reordering noise through the 8-iteration stiff
# contact Newton + IFT solve reaches ~1e-2 absolute on fx at hard
# random states (large entries agree to ~3e-5 relative; fu stays at
# ~5e-3).  The same noise class bounds the lanestep/megastep twins
# (CLAUDE.md).


def test_pallas_jac_matches_lane_cheetah():
    system, x_T, u_T = _cheetah_lanes(16)
    k = pallas_jac_for_system(system, block_b=8, interpret=True)
    assert k is not None
    fx, fu = k(x_T, u_T)
    fx_ref, fu_ref = system.lane_jac_fn(x_T, u_T)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fx_ref),
                               rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                               rtol=2e-3, atol=5e-3)


def test_pallas_jac_pads_partial_tile():
    """Lane counts that are not a block multiple replicate the last lane
    (zero-padding would feed the contact Newton a zero quaternion) and
    slice back."""
    system, x_T, u_T = _cheetah_lanes(11, seed=3)
    k = pallas_jac_for_system(system, block_b=8, interpret=True)
    fx, fu = k(x_T, u_T)
    assert fx.shape == (37, 37, 11) and fu.shape == (37, 12, 11)
    fx_ref, fu_ref = system.lane_jac_fn(x_T, u_T)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fx_ref),
                               rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                               rtol=2e-3, atol=5e-3)


def test_pallas_jac_root_seeded_matches_lane_root():
    """The root-seeded kernel variant (third x_next input — the
    production bench path, see solver/batched.py) matches the XLA lane
    root jac in interpret mode."""
    system, x_T, u_T = _cheetah_lanes(16, seed=5)
    # a consistent next state: the system's own lane step
    xn_T = system.lane_step_fn(x_T, u_T)
    k = pallas_jac_for_system(system, block_b=8, root_seed=True,
                              interpret=True)
    assert k is not None
    fx, fu = k(x_T, u_T, xn_T)
    fx_ref, fu_ref = system.lane_jac_root_fn(x_T, u_T, xn_T)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fx_ref),
                               rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(fu_ref),
                               rtol=2e-3, atol=5e-3)


def test_vmem_legality_gate_rejects_bad_tilings():
    """Build-time Mosaic-legality gate (VERDICT r4 item 7): tilings that
    die in the hardware compiler (measured: tools/probe_megajac_sweep.py)
    must fail at BUILD time with MegajacVmemError, on CPU, so CI catches
    an illegal kernel config before the bench silently falls back."""
    import pytest

    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.ops.megajac import (MegajacVmemError,
                                           pallas_jac_for_system)

    cfg = mc.Config(contact_iters=8)
    system, _ = mc.build_system(cfg)
    # known-good flagship tiling builds
    assert pallas_jac_for_system(system, block_b=128) is not None
    # measured-dead tilings are rejected before Mosaic sees them
    for kw in ({"block_b": 256}, {"block_b": 128, "q_group": 4}):
        with pytest.raises(MegajacVmemError):
            pallas_jac_for_system(system, **kw)
