"""Parallel-in-time Riccati backward pass via associative scan.

The reference's backward pass is a strictly sequential t = N-2..0 sweep
(reference ilqr.py:623-667); on TPU that is latency-bound: ~N dependent
iterations of tiny matrix ops.  The value-function recursion is an
associative composition of linear-fractional (Riccati) maps, so the
whole sweep parallelizes to O(log N) depth with `lax.associative_scan`
(cf. PAPERS.md "Temporal Parallelization of Riccati recursions" /
Särkkä & García-Fernández) — the time-axis analog of sequence
parallelism (SURVEY.md §2.4).

Derivation (matches solver/ilqr.py:_backward_pass exactly):
a value function V(z) = 1/2 z' S z + v' z propagates through one iLQR
step (fx, fu, lx, lu, lxx = 2Q, luu = 2R + reg) as

    S' = lxx + fx' S (I + C S)^{-1} fx
    v' = lx  + fx' (I + S C)^{-1} (v - S b)

with C = fu luu^{-1} fu' and b = fu luu^{-1} lu.  Maps of the 5-tuple
(A = fx, b, C, J = lxx, eta = lx) are closed under composition:

    combine(early, late):
        M1 = (I + C_e J_l)^{-1}
        M2 = (I + J_l C_e)^{-1}
        A  = A_l M1 A_e
        b  = A_l M1 (b_e + C_e eta_l) + b_l
        C  = A_l M1 C_e A_l' + C_l
        eta= A_e' M2 (eta_l - J_l b_e) + eta_e
        J  = A_e' M2 J_l A_e + J_e

A suffix composition over [t, N] applied to the zero value gives
(S_t, v_t) = (J, eta) directly; gains then come from (S_{t+1}, v_{t+1})
in one fully vectorized shot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drake_ddp_tpu.utils.linalg import solve_small, solve_spd


def _combine(late, early):
    """Associative combine.  NOTE argument order: with
    ``associative_scan(fn, elems, reverse=True)`` the suffix composition
    requires fn(a, b) == compose(span_a_is_earlier=b? ...) — the order
    is fixed by the equivalence test against the sequential pass."""
    A_l, b_l, C_l, J_l, eta_l = late
    A_e, b_e, C_e, J_e, eta_e = early
    n = A_l.shape[-1]
    eye = jnp.eye(n, dtype=A_l.dtype)
    mv = lambda M, x: jnp.einsum("...ij,...j->...i", M, x)
    M1 = _inv(eye + C_e @ J_l)
    M2 = _inv(eye + J_l @ C_e)
    AlM1 = A_l @ M1
    AeT = jnp.swapaxes(A_e, -1, -2)
    A = AlM1 @ A_e
    b = mv(AlM1, b_e + mv(C_e, eta_l)) + b_l
    C = AlM1 @ C_e @ jnp.swapaxes(A_l, -1, -2) + C_l
    eta = mv(AeT @ M2, eta_l - mv(J_l, b_e)) + eta_e
    J = AeT @ M2 @ J_l @ A_e + J_e
    return A, b, C, J, eta


def _inv(A):
    """Inverse of I-plus-PSD-product matrices (eigenvalues >= 1, so
    Gauss-Jordan without pivoting is safe), batched over leading dims."""
    from drake_ddp_tpu.utils.linalg import _gauss_jordan

    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    return _gauss_jordan(A, eye)


def parallel_backward_pass(cfg, prob, x_bar, u_bar, fx, fu, reg=None):
    """Drop-in replacement for solver.ilqr._backward_pass with O(log N)
    sequential depth.  Returns (kappa, K, dV) identical (to float
    tolerance) to the sequential sweep."""
    # TPU matmuls default to bf16 passes; the deep composition tree
    # amplifies that to NaN at n ~ 37 — force full f32 throughout.
    with jax.default_matmul_precision("float32"):
        return _parallel_backward_pass(cfg, prob, x_bar, u_bar, fx, fu, reg)


def _parallel_backward_pass(cfg, prob, x_bar, u_bar, fx, fu, reg=None):
    N1, n = fx.shape[0], fx.shape[-1]
    m = fu.shape[-1]
    dtype = x_bar.dtype
    if reg is None:
        reg = jnp.asarray(cfg.reg, dtype)
    x_nom, Q, R, Qf = prob.x_nom, prob.Q, prob.R, prob.Qf

    lx = 2.0 * (x_bar[:-1] - x_nom) @ Q            # (N-1, n)
    lu = 2.0 * u_bar @ R                           # (N-1, m)
    lxx = jnp.broadcast_to(2.0 * Q, (N1, n, n))
    luu = 2.0 * R + reg * jnp.eye(m, dtype=dtype)  # (m, m)

    # per-step element
    luu_inv_fuT = jax.vmap(
        lambda f: solve_spd(luu, f.T))(fu)         # (N-1, m, n)
    C = fu @ luu_inv_fuT                           # (N-1, n, n)
    b = jnp.einsum("tnm,tm->tn", fu,
                   jax.vmap(lambda l: solve_spd(luu, l))(lu))
    A = fx
    J = lxx
    eta = lx

    # terminal element (value at the final state)
    zeros_nn = jnp.zeros((1, n, n), dtype)
    A_all = jnp.concatenate([A, zeros_nn], axis=0)
    b_all = jnp.concatenate([b, jnp.zeros((1, n), dtype)], axis=0)
    C_all = jnp.concatenate([C, zeros_nn], axis=0)
    J_all = jnp.concatenate([J, 2.0 * Qf[None]], axis=0)
    eta_all = jnp.concatenate(
        [eta, (2.0 * Qf @ (x_bar[-1] - x_nom))[None]], axis=0)

    elems = (A_all, b_all, C_all, J_all, eta_all)
    # suffix compositions: index t holds the composition over [t, N]
    suff = jax.lax.associative_scan(_combine, elems, reverse=True, axis=0)
    S = suff[3]          # (N, n, n): S[t] = Vxx at t
    v = suff[4]          # (N, n):    v[t] = Vx at t

    # gains from V_{t+1}, fully vectorized over t (ilqr.py:651-663)
    S_next, v_next = S[1:], v[1:]
    Qu = lu + jnp.einsum("tnm,tn->tm", fu, v_next)
    fuT_S = jnp.einsum("tnm,tnk->tmk", fu, S_next)     # (N-1, m, n)
    Quu = luu + fuT_S @ fu
    Qux = fuT_S @ fx
    rhs = jnp.concatenate([Qu[..., None], Qux], axis=-1)
    sol = jax.vmap(solve_spd)(Quu, rhs)
    kappa = sol[..., 0]
    K = sol[..., 1:]
    dV = jnp.einsum("tm,tm->t", Qu, kappa)
    return kappa, K, dV
