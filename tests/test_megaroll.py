"""Fused whole-horizon Pallas rollout (ops/megaroll.py) equivalence vs
the per-step lane scan it replaces — interpret mode on CPU;
compiled-mode parity is exercised on TPU by bench.py.

The closed-loop policy u_t = u_bar_t - eps kappa_t - K_t (x_t - x_bar_t)
matches the reference linesearch rollout (reference ilqr.py:312-316)."""

import numpy as np
import jax
import jax.numpy as jnp

from drake_ddp_tpu.ops.megaroll import make_pallas_rollout


def _scan_reference(step_T, x0, eps, u_bar, kappa, K, x_bar):
    """The per-step scan path of solver/batched._chunk_rollout_lanes."""

    def body(x, inputs):
        ub_t, kap_t, K_t, xb_t = inputs
        dx = x - xb_t
        Kdx = jnp.sum(K_t * dx[None], axis=1)
        u = ub_t - eps[None] * kap_t - Kdx
        x_next = step_T(x, u)
        return x_next, (x_next, u)

    _, (xs, us) = jax.lax.scan(body, x0, (u_bar, kappa, K, x_bar))
    return xs, us


def _tapes(rng, T, n, m, B, x0, u0, scale=0.1):
    u_bar = jnp.asarray(
        np.tile(u0, (T, 1, 1)).transpose(0, 2, 1)
        + scale * rng.standard_normal((T, m, B)), jnp.float32)
    kappa = jnp.asarray(
        scale * rng.standard_normal((T, m, B)), jnp.float32)
    K = jnp.asarray(
        0.1 * scale * rng.standard_normal((T, m, n, B)), jnp.float32)
    x_bar = jnp.asarray(
        np.tile(np.asarray(x0), (T, 1, 1)).transpose(0, 2, 1)
        + 0.01 * rng.standard_normal((T, n, B)), jnp.float32)
    eps = jnp.asarray(rng.uniform(0.2, 1.0, (B,)), jnp.float32)
    return eps, u_bar, kappa, K, x_bar


def test_fused_rollout_matches_scan_cheetah():
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    n, m = system.n, system.m
    N, B = 6, 8
    T = N - 1
    rng = np.random.default_rng(0)
    x0b = jnp.asarray(
        np.tile(np.asarray(x0, np.float32), (B, 1)).T
        + 0.01 * rng.standard_normal((n, B)).astype(np.float32))
    eps, u_bar, kappa, K, x_bar = _tapes(
        rng, T, n, m, B, x0, np.asarray(mc.U_STAND, np.float32))

    fused = make_pallas_rollout(
        system.params[0], system.params[1], system.dt, N,
        contact_iters=system.lane_step_fn.contact_iters,
        force_params=system.lane_step_fn.force_params,
        block_b=8, interpret=True)
    xs, us = fused(x0b, eps, u_bar, kappa, K, x_bar)
    xs_ref, us_ref = _scan_reference(
        system.lane_step_fn, x0b, eps, u_bar, kappa, K, x_bar)
    np.testing.assert_allclose(np.asarray(us), np.asarray(us_ref),
                               rtol=1e-3, atol=2e-3)
    # states: interpreter-vs-XLA ulps amplify through the stiff contact
    # Newton over the horizon (observed: <1.5% of elements, <4e-2 abs).
    # The tight per-step twin pin is tests/test_megastep.py; this chain
    # check guards structural kernel bugs (wrong tape indexing, missing
    # terms), which break every element at O(1).
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref),
                               rtol=5e-2, atol=5e-2)


def test_fused_rollout_pads_ragged_batch():
    """B not a multiple of block_b exercises the pad/slice path."""
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    n, m = system.n, system.m
    N, B = 4, 5
    T = N - 1
    rng = np.random.default_rng(1)
    x0b = jnp.asarray(np.tile(np.asarray(x0, np.float32), (B, 1)).T)
    eps, u_bar, kappa, K, x_bar = _tapes(
        rng, T, n, m, B, x0, np.asarray(mc.U_STAND, np.float32))

    fused = make_pallas_rollout(
        system.params[0], system.params[1], system.dt, N,
        contact_iters=system.lane_step_fn.contact_iters,
        force_params=system.lane_step_fn.force_params,
        block_b=8, interpret=True)
    xs, us = fused(x0b, eps, u_bar, kappa, K, x_bar)
    assert xs.shape == (T, n, B) and us.shape == (T, m, B)
    xs_ref, us_ref = _scan_reference(
        system.lane_step_fn, x0b, eps, u_bar, kappa, K, x_bar)
    np.testing.assert_allclose(np.asarray(us), np.asarray(us_ref),
                               rtol=1e-3, atol=2e-3)
    # states: interpreter-vs-XLA ulps amplify through the stiff contact
    # Newton over the horizon (observed: <1.5% of elements, <4e-2 abs).
    # The tight per-step twin pin is tests/test_megastep.py; this chain
    # check guards structural kernel bugs (wrong tape indexing, missing
    # terms), which break every element at O(1).
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref),
                               rtol=5e-2, atol=5e-2)


def test_fused_rollout_flagship_shapes():
    """The FLAGSHIP shapes (n=37, m=12, N=50, block_b=128) in interpret
    mode: interpret honors real shapes even on CPU, so the shape/padding
    regression class that killed the r02 bench (unpadded n=37 K-tape DMA
    — caught statically by _assert_k_dma_legal, exercised here through
    the build) can never again reach the bench untested."""
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    n, m = system.n, system.m
    N, B = 50, 128
    T = N - 1
    rng = np.random.default_rng(3)
    x0b = jnp.asarray(
        np.tile(np.asarray(x0, np.float32), (B, 1)).T
        + 0.005 * rng.standard_normal((n, B)).astype(np.float32))
    eps, u_bar, kappa, K, x_bar = _tapes(
        rng, T, n, m, B, x0, np.asarray(mc.U_STAND, np.float32),
        scale=0.01)

    fused = make_pallas_rollout(
        system.params[0], system.params[1], system.dt, N,
        contact_iters=system.lane_step_fn.contact_iters,
        force_params=system.lane_step_fn.force_params,
        block_b=128, interpret=True)
    xs, us = fused(x0b, eps, u_bar, kappa, K, x_bar)
    assert xs.shape == (T, n, B) and us.shape == (T, m, B)
    # structural check only at a few probe steps: a full 49-step scan
    # reference doubles the cost of an already-heavy pin, and the chain
    # equivalence is pinned at small shapes above; here we roll the lane
    # step forward a few steps and compare prefixes.
    probe_T = 4
    xs_ref, us_ref = _scan_reference(
        system.lane_step_fn, x0b, eps, u_bar[:probe_T], kappa[:probe_T],
        K[:probe_T], x_bar[:probe_T])
    np.testing.assert_allclose(np.asarray(us[:probe_T]),
                               np.asarray(us_ref), rtol=1e-3, atol=2e-3)
    # states: a FRACTION check, not allclose — at 128 random lanes a few
    # hit stiff contact transitions where interpreter-vs-XLA ulps
    # amplify to O(1) within steps (observed 0.15% of elements); a
    # structural kernel bug (wrong tape indexing, missing terms) breaks
    # essentially every element at O(1).
    d = np.abs(np.asarray(xs[:probe_T]) - np.asarray(xs_ref))
    tol = 2e-2 + 2e-2 * np.abs(np.asarray(xs_ref))
    assert float(np.mean(d <= tol)) > 0.99
    assert bool(jnp.all(jnp.isfinite(xs)))


def test_k_dma_legality_checker():
    """The static Mosaic-legality gate: the exact r02 configuration
    (unpadded n=37 slice of a (8,128)-tiled K memref) must fail at BUILD
    time, and sub-128 block_b must fail for hardware builds."""
    import pytest

    from drake_ddp_tpu.ops.megaroll import _assert_k_dma_legal

    # legal flagship config: n padded 37 -> 40, block_b = 128
    _assert_k_dma_legal(49, 12, 40, 128, interpret=False)
    # the r02 bug: n extent 37 not sublane-aligned
    with pytest.raises(ValueError, match="sublane"):
        _assert_k_dma_legal(49, 12, 37, 128, interpret=False)
    # sublane alignment is enforced in interpret mode too (CI shapes)
    with pytest.raises(ValueError, match="sublane"):
        _assert_k_dma_legal(49, 12, 37, 8, interpret=True)
    # lane tile: block_b must be a multiple of 128 on hardware...
    with pytest.raises(ValueError, match="lane"):
        _assert_k_dma_legal(49, 12, 40, 64, interpret=False)
    # ...but interpret tests legitimately use tiny block_b
    _assert_k_dma_legal(49, 12, 40, 8, interpret=True)


def test_fused_rollout_passive_system():
    """m == 0 (passive ball): the zero-width control path."""
    from tests.test_contact import ball_on_ground

    system, radius, _ = ball_on_ground()
    n = system.n
    N, B = 5, 8
    T = N - 1
    rng = np.random.default_rng(2)
    xb = np.zeros((n, B), np.float32)
    xb[0] = 1.0
    xb[6] = radius - 0.002
    xb[7:] = 0.3 * rng.standard_normal((6, B)).astype(np.float32)
    x0b = jnp.asarray(xb)
    eps = jnp.asarray(rng.uniform(0.2, 1.0, (B,)), jnp.float32)
    z = jnp.zeros((T, 0, B), jnp.float32)
    K = jnp.zeros((T, 0, n, B), jnp.float32)
    x_bar = jnp.asarray(
        np.tile(xb, (T, 1, 1)) + 0.01 * rng.standard_normal((T, n, B)),
        jnp.float32)

    fused = make_pallas_rollout(
        system.params[0], system.params[1], system.dt, N,
        contact_iters=system.lane_step_fn.contact_iters,
        force_params=system.lane_step_fn.force_params,
        block_b=8, interpret=True)
    xs, us = fused(x0b, eps, z, z, K, x_bar)
    assert us.shape == (T, 0, B)
    xs_ref, _ = _scan_reference(
        system.lane_step_fn, x0b, eps, z, z, K, x_bar)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref),
                               rtol=1e-3, atol=2e-3)
