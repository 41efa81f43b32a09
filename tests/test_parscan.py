"""Parallel-in-time Riccati backward pass must reproduce the sequential
sweep exactly (solver/parscan.py vs solver/ilqr._backward_pass)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, _backward_pass
from drake_ddp_tpu.solver.parscan import parallel_backward_pass


def _random_problem(key, N, n, m, dtype=jnp.float64):
    ks = jax.random.split(key, 8)
    sq = lambda k, d: (lambda a: a @ a.T + d * jnp.eye(a.shape[0], dtype=dtype))(
        jax.random.normal(k, (d * 0 + n if d else m,) * 0 or None))
    Qm = jax.random.normal(ks[0], (n, n), dtype) * 0.3
    Q = Qm @ Qm.T + 0.1 * jnp.eye(n, dtype=dtype)
    Rm = jax.random.normal(ks[1], (m, m), dtype) * 0.3
    R = Rm @ Rm.T + 0.1 * jnp.eye(m, dtype=dtype)
    Qfm = jax.random.normal(ks[2], (n, n), dtype) * 0.3
    Qf = Qfm @ Qfm.T + 0.5 * jnp.eye(n, dtype=dtype)
    prob = ILQRProblem(
        x0=jax.random.normal(ks[3], (n,), dtype),
        x_nom=jax.random.normal(ks[4], (n,), dtype),
        Q=Q, R=R, Qf=Qf,
        u_init=jnp.zeros((N - 1, m), dtype),
    )
    x_bar = jax.random.normal(ks[5], (N, n), dtype)
    u_bar = jax.random.normal(ks[6], (N - 1, m), dtype)
    # stable-ish random dynamics linearizations
    fx = 0.95 * jnp.eye(n, dtype=dtype) + 0.1 * jax.random.normal(
        ks[7], (N - 1, n, n), dtype)
    fu = 0.3 * jax.random.normal(ks[0], (N - 1, n, m), dtype)
    return prob, x_bar, u_bar, fx, fu


@pytest.mark.parametrize("N,n,m", [(8, 3, 2), (50, 7, 3), (33, 5, 5)])
def test_parscan_matches_sequential(N, n, m):
    prob, x_bar, u_bar, fx, fu = _random_problem(
        jax.random.PRNGKey(N + n + m), N, n, m)
    cfg = ILQRConfig(num_steps=N, reg=1e-6)
    k_seq, K_seq, dV_seq = _backward_pass(cfg, prob, x_bar, u_bar, fx, fu)
    k_par, K_par, dV_par = parallel_backward_pass(
        cfg, prob, x_bar, u_bar, fx, fu)
    np.testing.assert_allclose(np.asarray(k_par), np.asarray(k_seq),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(K_par), np.asarray(K_seq),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dV_par), np.asarray(dV_seq),
                               rtol=1e-8, atol=1e-8)


def test_parscan_f32_accuracy():
    """f32 parallel pass tracks the f64 sequential pass on a long
    horizon (the practical TPU configuration)."""
    N, n, m = 100, 4, 1
    prob, x_bar, u_bar, fx, fu = _random_problem(
        jax.random.PRNGKey(0), N, n, m)
    cfg = ILQRConfig(num_steps=N, reg=1e-6)
    k64, K64, _ = _backward_pass(cfg, prob, x_bar, u_bar, fx, fu)
    to32 = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), t)
    k32, K32, _ = parallel_backward_pass(
        cfg, to32(prob), to32(x_bar), to32(u_bar), to32(fx), to32(fu))
    scale = np.abs(np.asarray(K64)).max()
    assert np.abs(np.asarray(K32, np.float64) - np.asarray(K64)).max() \
        < 1e-3 * scale
