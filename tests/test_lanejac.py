"""Structured-IFT lane-major Jacobians (multibody/lanejac.py) must match
the per-scenario ``jax.jacfwd`` path (plant.py lax.custom_root IFT —
the TPU replacement for the reference's AutoDiffXd pipeline,
reference ilqr.py:233-272)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drake_ddp_tpu.multibody.lanejac import make_lane_jac
from drake_ddp_tpu.solver import keypoints as kp


def _jac_pair(system):
    model, contact = system.params
    lane = system.lane_step_fn
    jac_T = make_lane_jac(model, contact, system.dt,
                          contact_iters=lane.contact_iters,
                          force_params=lane.force_params)
    return jac_T


def _compare(system, xb, ub):
    jac_T = _jac_pair(system)

    # f64: the two IFT formulations agree to roundoff
    x64, u64 = jnp.asarray(xb, jnp.float64), jnp.asarray(ub, jnp.float64)
    fxr, fur = jax.vmap(system.linearize)(x64, u64)
    fxl, ful = jax.jit(jac_T)(x64.T, u64.T)
    fxl = np.moveaxis(np.asarray(fxl), -1, 0)
    ful = np.moveaxis(np.asarray(ful), -1, 0)
    np.testing.assert_allclose(fxl, np.asarray(fxr), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(ful, np.asarray(fur), rtol=1e-8, atol=1e-9)

    # f32: both paths round differently through the stiff solve; require
    # the lane path stays close to the f64 truth wherever the scalar
    # path does
    x32, u32 = jnp.asarray(xb, jnp.float32), jnp.asarray(ub, jnp.float32)
    fxr32, _ = jax.vmap(system.linearize)(x32, u32)
    fxl32, _ = jax.jit(jac_T)(x32.T, u32.T)
    fxl32 = np.moveaxis(np.asarray(fxl32), -1, 0)
    scale = np.abs(np.asarray(fxr)).max()
    e_scalar = np.abs(np.asarray(fxr32) - np.asarray(fxr)).max() / scale
    e_lane = np.abs(fxl32 - np.asarray(fxr)).max() / scale
    assert e_lane <= 3.0 * e_scalar + 1e-5, (e_lane, e_scalar)


def test_lane_jac_cheetah():
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    rng = np.random.default_rng(0)
    B = 4
    xb = np.tile(np.asarray(x0, np.float64), (B, 1))
    xb[:, 19:] += 0.2 * rng.standard_normal((B, 18))
    xb[:, 4:7] += 0.01 * rng.standard_normal((B, 3))
    ub = np.tile(np.asarray(mc.U_STAND, np.float64), (B, 1))
    ub += 0.5 * rng.standard_normal(ub.shape)
    _compare(system, xb, ub)


def test_lane_jac_ball_contact():
    """Sphere-halfspace contact incl. airborne and penetrating lanes."""
    from tests.test_contact import ball_on_ground

    system, _, _ = ball_on_ground(iters=4)
    rng = np.random.default_rng(2)
    B = 6
    n = system.n
    xb = np.zeros((B, n))
    xb[:, :4] = [1.0, 0, 0, 0]
    xb[:, 6] = np.linspace(0.04, 0.12, B)      # below/at/above contact
    xb[:, 7:] = 0.3 * rng.standard_normal((B, n - 7))
    ub = np.zeros((B, system.m))
    _compare(system, xb, ub)


def test_batched_derivatives_match_vmap():
    """compute_derivatives_batched == vmap(compute_derivatives) for every
    keypoint method."""
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    jac_T = _jac_pair(system)
    step = system.bound_step()
    x0, _ = mc.initial_and_target(cfg)
    N, B = 12, 3
    rng = np.random.default_rng(3)
    u = jnp.asarray(
        np.tile(np.asarray(mc.U_STAND, np.float32), (B, N - 1, 1))
        + 0.3 * rng.standard_normal((B, N - 1, system.m)).astype(np.float32))
    x0b = jnp.asarray(np.tile(np.asarray(x0, np.float32), (B, 1)))
    x = jax.vmap(system.rollout)(x0b, u)

    configs = [
        kp.DerivsInterpolation("setInterval", minN=4, max_keypoints=4),
        kp.DerivsInterpolation("setInterval", minN=1),
        kp.DerivsInterpolation("adaptiveJerk", minN=2, maxN=6,
                               jerk_threshold=0.1, max_keypoints=8),
        kp.DerivsInterpolation("iterativeError", minN=2,
                               iterative_error_threshold=1e-3),
    ]
    for dcfg in configs:
        fxr, fur, pr = jax.vmap(
            lambda xt, ut: kp.compute_derivatives(step, dcfg, xt, ut))(x, u)
        fxl, ful, pl = kp.compute_derivatives_batched(jac_T, dcfg, x, u)
        # both paths are exact in f64 (see _compare); in f32 they round
        # differently through the stiff continuation contact solve —
        # observed noise: <0.02% of elements at <1% relative (a real
        # structural bug moves O(1) fractions of the stack by O(1))
        np.testing.assert_allclose(np.asarray(fxl), np.asarray(fxr),
                                   rtol=1.5e-2, atol=8e-3,
                                   err_msg=str(dcfg))
        np.testing.assert_allclose(np.asarray(ful), np.asarray(fur),
                                   rtol=1.5e-2, atol=8e-3,
                                   err_msg=str(dcfg))
        np.testing.assert_allclose(np.asarray(pl), np.asarray(pr),
                                   atol=1e-4, err_msg=str(dcfg))


def test_batched_solver_lane_vs_xla_derivs():
    """The full batched solve agrees between deriv kernels."""
    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.solver.batched import solve_ilqr_batched
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem

    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    N, B = 10, 3
    Q, R, Qf = mc.costs(cfg)
    x0, x_nom = mc.initial_and_target(cfg)
    scfg = ILQRConfig(num_steps=N, delta=cfg.delta, beta=cfg.beta,
                      max_iters=3, ls_parallel=4)
    rng = np.random.default_rng(4)
    x0b = np.tile(np.asarray(x0, np.float32), (B, 1))
    x0b[:, 19:] += 0.05 * rng.standard_normal((B, 18)).astype(np.float32)
    tile = lambda a: jnp.tile(jnp.asarray(a, jnp.float32)[None],
                              (B,) + (1,) * np.ndim(a))
    probs = ILQRProblem(
        x0=jnp.asarray(x0b), x_nom=tile(np.asarray(x_nom)),
        Q=tile(cfg.dt * Q), R=tile(cfg.dt * R), Qf=tile(Qf),
        u_init=tile(np.tile(np.asarray(mc.U_STAND, np.float32),
                            (N - 1, 1))),
    )
    ref = jax.jit(lambda p: solve_ilqr_batched(
        system, scfg, p, deriv_kernel="xla"))(probs)
    got = jax.jit(lambda p: solve_ilqr_batched(
        system, scfg, p, deriv_kernel="lane"))(probs)
    # f32 derivative noise between the two kernels can shift a lane's
    # convergence by one outer iteration on this 3-iteration budget
    assert np.all(np.abs(np.asarray(got.iterations, np.int64)
                         - np.asarray(ref.iterations, np.int64)) <= 1)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost),
                               rtol=6e-2)
    assert not np.any(np.asarray(got.diverged))


def test_root_seeded_jac_matches_full_newton():
    """root_seed + refine_iters=0 linearizes at the trajectory's own
    x_{t+1}, which IS the cold-schedule Newton's last iterate — so on a
    consistent rollout it must match the full jac to twin noise.  (A
    polish step would move the point toward the fully converged
    final-width root and deviate ~1% — see lanejac docstring.)"""
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config(contact_iters=8)
    system, _ = mc.build_system(cfg)
    model, contact = system.params
    lane = system.lane_step_fn
    rootj = make_lane_jac(model, contact, system.dt,
                          contact_iters=lane.contact_iters,
                          force_params=lane.force_params,
                          root_seed=True, refine_iters=0)
    x0, _ = mc.initial_and_target(cfg)
    N, B = 12, 3
    rng = np.random.default_rng(5)
    u = jnp.asarray(
        np.tile(np.asarray(mc.U_STAND, np.float32), (B, N - 1, 1))
        + 0.3 * rng.standard_normal((B, N - 1, system.m)).astype(np.float32))
    x0b = np.tile(np.asarray(x0, np.float32), (B, 1))
    x0b[:, 19:] += 0.05 * rng.standard_normal((B, 18)).astype(np.float32)
    x = jax.vmap(system.rollout)(jnp.asarray(x0b), u)

    dcfg = kp.DerivsInterpolation("setInterval", minN=4, max_keypoints=4)
    fxf, fuf, _ = kp.compute_derivatives_batched(
        system.lane_jac_fn, dcfg, x, u, root=False)
    fxr, fur, _ = kp.compute_derivatives_batched(
        system.lane_jac_root_fn, dcfg, x, u, root=True)
    scale = float(np.abs(np.asarray(fxf)).max())
    assert float(np.abs(np.asarray(fxr - fxf)).max()) <= 2e-4 * scale
    np.testing.assert_allclose(np.asarray(fur), np.asarray(fuf),
                               rtol=2e-3, atol=1e-4)
    # system wiring: plant attaches the root twin
    assert system.lane_jac_root_fn is not None


def test_root_derivs_all_keypoint_methods():
    """compute_derivatives_batched(root=True) == root=False across every
    keypoint schedule (the setInterval bench path is covered above; this
    pins the adaptiveJerk and iterativeError gather paths, which thread
    x_{t+1} through dynamic keypoint orderings)."""
    from drake_ddp_tpu.examples import mini_cheetah as mc

    cfg = mc.Config(contact_iters=8)
    system, _ = mc.build_system(cfg)
    x0, _ = mc.initial_and_target(cfg)
    N, B = 12, 3
    rng = np.random.default_rng(9)
    u = jnp.asarray(
        np.tile(np.asarray(mc.U_STAND, np.float32), (B, N - 1, 1))
        + 0.3 * rng.standard_normal((B, N - 1, system.m)).astype(np.float32))
    x0b = np.tile(np.asarray(x0, np.float32), (B, 1))
    x0b[:, 19:] += 0.05 * rng.standard_normal((B, 18)).astype(np.float32)
    x = jax.vmap(system.rollout)(jnp.asarray(x0b), u)

    configs = [
        kp.DerivsInterpolation("adaptiveJerk", minN=2, maxN=6,
                               jerk_threshold=0.1, max_keypoints=8),
        kp.DerivsInterpolation("iterativeError", minN=2,
                               iterative_error_threshold=1e-3,
                               max_keypoints=6),
        kp.DerivsInterpolation("iterativeError", minN=2,
                               iterative_error_threshold=1e-3),
    ]
    scale = None
    for dcfg in configs:
        fxf, fuf, pf = kp.compute_derivatives_batched(
            system.lane_jac_fn, dcfg, x, u, root=False)
        fxr, fur, pr = kp.compute_derivatives_batched(
            system.lane_jac_root_fn, dcfg, x, u, root=True)
        scale = float(np.abs(np.asarray(fxf)).max())
        assert float(np.abs(np.asarray(fxr - fxf)).max()) <= 3e-4 * scale, dcfg
        np.testing.assert_allclose(np.asarray(fur), np.asarray(fuf),
                                   rtol=5e-3, atol=2e-4, err_msg=str(dcfg))
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pf),
                                   atol=1e-4, err_msg=str(dcfg))
