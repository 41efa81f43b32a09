"""Keypoint scheduler parity vs the NumPy spec mirror (SURVEY.md C1h-C1l)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drake_ddp_tpu.solver import keypoints as kp
import np_spec_mirror as ref


def mask_to_list(mask):
    return [i for i, v in enumerate(np.asarray(mask)) if v]


@pytest.mark.parametrize("N,minN", [(200, 1), (200, 5), (100, 7), (50, 49), (10, 3)])
def test_set_interval_mask(N, minN):
    got = mask_to_list(kp.set_interval_mask(N, minN))
    want = sorted(set(ref.keypoints_set_interval(N, minN)))
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("minN,maxN,thr", [(2, 20, 0.3), (5, 100, 0.0007), (1, 10, 0.1)])
def test_adaptive_jerk_mask(seed, minN, maxN, thr):
    rng = np.random.default_rng(seed)
    N, n = 60, 4
    x = np.cumsum(rng.normal(scale=0.2, size=(N, n)), axis=0)
    cfg = kp.DerivsInterpolation("adaptiveJerk", minN, maxN, thr, 0.0)
    got = mask_to_list(kp.adaptive_jerk_mask(cfg, jnp.asarray(x), N, n))
    want = sorted(set(ref.keypoints_adaptive_jerk(x, N, n, minN, maxN, thr)))
    assert got == want


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("minN,thr", [(2, 1e-4), (5, 1e-2), (2, 1e9), (2, 0.0)])
def test_iterative_error_mask(seed, minN, thr):
    rng = np.random.default_rng(seed)
    N, n = 34, 3
    # smooth-ish jacobian stack with a kink so subdivision is non-trivial
    base = rng.normal(size=(n, n))
    t = np.linspace(0, 1, N - 1)[:, None, None]
    fx = base + 0.5 * np.sin(3 * t) * rng.normal(size=(n, n))
    fx[N // 2:] += 0.3
    cfg = kp.DerivsInterpolation("iterativeError", minN, 0, 0.0, thr)
    got = mask_to_list(kp.iterative_error_mask(cfg, jnp.asarray(fx), N))
    want = ref.keypoints_iterative_error(fx, N, minN, thr)
    assert got == want


@pytest.mark.parametrize("N", [20, 57])
def test_interpolate_stack_matches_mirror(N):
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(N - 1, 3, 3))
    kps = sorted(set([0, 5, 11, N - 2]))
    mask = np.zeros(N - 1, bool)
    mask[kps] = True
    got = np.asarray(kp.interpolate_stack(jnp.asarray(mask), jnp.asarray(vals)))
    want = ref.interpolate(kps, vals)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sparse_gather_equals_dense_at_keypoints():
    """The gather/scatter sparse path must produce the same interpolated
    stack as dense evaluation + masking."""
    from drake_ddp_tpu.dynamics.analytic import cart_pole_system

    sys = cart_pole_system(dt=0.01)
    N = 40
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.3, size=(N, 4)), jnp.float32)
    u = jnp.asarray(rng.normal(scale=0.3, size=(N - 1, 1)), jnp.float32)
    step = sys.bound_step()

    cfg_sparse = kp.DerivsInterpolation("setInterval", 5, 0, 0.0, 0.0)
    fx_s, fu_s, pct = kp.compute_derivatives(step, cfg_sparse, x, u)

    # dense evaluation, same mask, manual interpolation
    fx_d, fu_d = jax.vmap(jax.jacfwd(step, argnums=(0, 1)))(x[:-1], u)
    mask = jnp.asarray(kp.set_interval_mask(N, 5))
    fx_ref = kp.interpolate_stack(mask, fx_d)
    fu_ref = kp.interpolate_stack(mask, fu_d)

    np.testing.assert_allclose(np.asarray(fx_s), np.asarray(fx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fu_s), np.asarray(fu_ref), rtol=1e-5, atol=1e-5)
    expected_pct = 100.0 * mask.sum() / (N - 1)
    assert abs(float(pct) - float(expected_pct)) < 1e-3


def test_keypoint_solver_end_to_end():
    """iLQR with each keypoint method still solves pendulum swing-up."""
    from drake_ddp_tpu.dynamics.analytic import pendulum_system
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, solve_ilqr

    dt, N = 1e-2, 200
    sys = pendulum_system(dt=dt)
    prob = ILQRProblem(
        x0=jnp.zeros(2, jnp.float32),
        x_nom=jnp.array([np.pi, 0.0], jnp.float32),
        Q=jnp.asarray(dt * 0.01 * np.diag([0, 1.0]), jnp.float32),
        R=jnp.asarray(dt * 0.01 * np.eye(1), jnp.float32),
        Qf=jnp.asarray(100 * np.eye(2), jnp.float32),
        u_init=jnp.zeros((N - 1, 1), jnp.float32),
    )
    for derivs in [
        kp.DerivsInterpolation("setInterval", 5, 0, 0.0, 0.0),
        kp.DerivsInterpolation("adaptiveJerk", 5, 100, 0.0007, 0.0),
        kp.DerivsInterpolation("iterativeError", 5, 0, 0.0, 1e-4),
    ]:
        cfg = ILQRConfig(num_steps=N, delta=1e-2, beta=0.95, max_iters=100, derivs=derivs)
        sol = jax.jit(lambda p: solve_ilqr(sys, cfg, p))(prob)
        assert not bool(sol.diverged), derivs.keypoint_method
        assert abs(float(sol.x[-1, 0]) - np.pi) < 0.15, derivs.keypoint_method


def _cart_pole_traj(N=40, B=None, seed=0):
    from drake_ddp_tpu.dynamics.analytic import cart_pole_system

    rng = np.random.default_rng(seed)
    shape = (N, 4) if B is None else (B, N, 4)
    ushape = (N - 1, 1) if B is None else (B, N - 1, 1)
    x = jnp.asarray(rng.normal(scale=0.3, size=shape), jnp.float32)
    u = jnp.asarray(rng.normal(scale=0.3, size=ushape), jnp.float32)
    return cart_pole_system(dt=0.01).bound_step(), x, u


def _lane_jac(step):
    """Reference lane-major Jacobian kernel built from vmapped jacfwd."""

    def jac_T(xL, uL):
        fx, fu = jax.vmap(jax.jacfwd(step, argnums=(0, 1)))(xL.T, uL.T)
        return jnp.moveaxis(fx, 0, -1), jnp.moveaxis(fu, 0, -1)

    return jac_T


@pytest.mark.parametrize("minN,thr", [(2, 1e-4), (5, 1e-2), (2, 0.0)])
def test_iterative_error_sparse_matches_dense(minN, thr):
    """Budgeted lazy evaluation reproduces the dense-replay parity path
    exactly when the budget covers the true keypoint set."""
    step, x, u = _cart_pole_traj()
    N = x.shape[0]
    cfg_d = kp.DerivsInterpolation("iterativeError", minN, 0, 0.0, thr)
    fx_d, fu_d, pct_d = kp.compute_derivatives(step, cfg_d, x, u)
    cfg_s = cfg_d._replace(max_keypoints=N)
    fx_s, fu_s, pct_s = kp.compute_derivatives(step, cfg_s, x, u)
    np.testing.assert_allclose(np.asarray(fx_s), np.asarray(fx_d), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fu_s), np.asarray(fu_d), rtol=2e-5, atol=2e-5)
    assert abs(float(pct_s) - float(pct_d)) < 1e-3
    # A tight budget must still produce finite, usable derivatives.
    fx_t, _, pct_t = kp.compute_derivatives(step, cfg_d._replace(max_keypoints=7), x, u)
    assert np.isfinite(np.asarray(fx_t)).all()
    assert float(pct_t) <= float(pct_s) + 1e-3


def test_iterative_error_sparse_batched_matches_single():
    step, x, u = _cart_pole_traj(B=3)
    cfg = kp.DerivsInterpolation("iterativeError", 2, 0, 0.0, 1e-4,
                                 max_keypoints=x.shape[1])
    fx_b, fu_b, pct_b = kp.compute_derivatives_batched(_lane_jac(step), cfg, x, u)
    for b in range(x.shape[0]):
        fx1, fu1, p1 = kp.compute_derivatives(step, cfg, x[b], u[b])
        np.testing.assert_allclose(np.asarray(fx_b[b]), np.asarray(fx1), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(fu_b[b]), np.asarray(fu1), rtol=2e-5, atol=2e-5)
        assert abs(float(pct_b[b]) - float(p1)) < 1e-3


@pytest.mark.parametrize("minN,maxN,thr", [(2, 20, 0.3), (5, 100, 0.0007), (1, 10, 0.1)])
def test_adaptive_jerk_auto_budget(minN, maxN, thr):
    """With max_keypoints unset, adaptiveJerk derives a sufficient static
    budget (spacing >= min(minN, maxN)) — sparse result == dense result."""
    step, x, u = _cart_pole_traj()
    N = x.shape[0]
    cfg = kp.DerivsInterpolation("adaptiveJerk", minN, maxN, thr, 0.0)
    mask = kp.adaptive_jerk_mask(cfg, x, N, 4)
    assert int(np.asarray(mask).sum()) <= kp._adaptive_jerk_budget(cfg, N)
    fx_a, fu_a, _ = kp.compute_derivatives(step, cfg, x, u)
    fx_full, fu_full = jax.vmap(jax.jacfwd(step, argnums=(0, 1)))(x[:-1], u)
    np.testing.assert_allclose(
        np.asarray(fx_a), np.asarray(kp.interpolate_stack(mask, fx_full)),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fu_a), np.asarray(kp.interpolate_stack(mask, fu_full)),
        rtol=2e-5, atol=2e-5)
