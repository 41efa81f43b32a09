"""solve_spd correctness vs numpy for all code paths (n=1,2,3,8; vec/mat)."""

import numpy as np
import pytest
import jax.numpy as jnp

from drake_ddp_tpu.utils.linalg import solve_spd, inv_spd


@pytest.mark.parametrize("n", [1, 2, 3, 8, 18])
@pytest.mark.parametrize("batch", [(), (7,)])
def test_solve_spd_vector(n, batch):
    rng = np.random.default_rng(n)
    G = rng.normal(size=batch + (n, n))
    A = G @ np.swapaxes(G, -1, -2) + n * np.eye(n)
    b = rng.normal(size=batch + (n,))
    got = np.asarray(solve_spd(jnp.asarray(A), jnp.asarray(b)))
    want = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,k", [(1, 3), (2, 4), (5, 2), (12, 13)])
def test_solve_spd_matrix_rhs(n, k):
    rng = np.random.default_rng(n * 10 + k)
    G = rng.normal(size=(n, n))
    A = G @ G.T + n * np.eye(n)
    B = rng.normal(size=(n, k))
    got = np.asarray(solve_spd(jnp.asarray(A), jnp.asarray(B)))
    want = np.linalg.solve(A, B)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", [1, 2, 6])
def test_inv_spd(n):
    rng = np.random.default_rng(n)
    G = rng.normal(size=(n, n))
    A = G @ G.T + n * np.eye(n)
    got = np.asarray(inv_spd(jnp.asarray(A)))
    np.testing.assert_allclose(got, np.linalg.inv(A), rtol=1e-5, atol=1e-6)
