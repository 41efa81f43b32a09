"""Small dense solves tuned for TPU trace size and fusion.

``jnp.linalg.solve`` lowers to an LU custom call that costs ~1.5 ms per
invocation on TPU even for a 2x2 — catastrophic inside a per-timestep
``lax.scan`` (measured: a 100-step rollout goes 150 ms -> 28 ms when the
2x2 solve is replaced with the closed form).  Multibody mass matrices
and iLQR's Quu are SPD and small (n <= ~20), so we use closed forms for
n <= 3 and *row-vectorized* Gauss-Jordan elimination otherwise: n
elimination steps of whole-row vector ops.  This keeps the trace at
O(n) HLO ops (a fully scalar-unrolled Cholesky is O(n^3) ops, which
made ``jax.jacfwd`` of a contact step take ~7 minutes to compile at
nv = 18), while remaining straight-line code XLA fuses into the
surrounding scan body.

Gauss-Jordan without pivoting is numerically safe for the SPD /
diagonally dominant systems used here (mass matrices, Quu + reg,
implicit-contact Newton matrices M + dt^2 J^T K J).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chol_vec(A: jax.Array) -> jax.Array:
    """Lower Cholesky factor via column-loop Cholesky-Crout, vectorized
    over rows: n iterations of matvec/vector ops (O(n) HLO ops, vs O(n^3)
    for a fully scalar-unrolled factorization), numerically equivalent to
    classic Cholesky — which matters: Gauss-Jordan without pivoting loses
    visible accuracy on f32 Riccati recursions."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    idx = jnp.arange(n)
    for j in range(n):
        # s_i = A[i, j] - sum_{k<j} L[i, k] L[j, k]
        if j:
            s = A[..., :, j] - jnp.einsum(
                "...ik,...k->...i", L[..., :, :j], L[..., j, :j])
        else:
            s = A[..., :, j]
        d = jnp.sqrt(s[..., j:j + 1])
        col = jnp.where(idx >= j, s / d, jnp.zeros_like(s))
        L = L.at[..., :, j].set(col)
    return L


def _chol_solve_vec(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L L^T X = B with row-loop triangular solves (vectorized over
    RHS columns).  B: (..., n, k)."""
    n = L.shape[-1]
    # forward: L Y = B
    ys = []
    for i in range(n):
        s = B[..., i, :]
        if i:
            Yi = jnp.stack(ys, axis=-2)                       # (..., i, k)
            s = s - jnp.einsum("...k,...kj->...j", L[..., i, :i], Yi)
        ys.append(s / L[..., i, i, None])
    # backward: L^T X = Y
    xs = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        if i + 1 < n:
            Xi = jnp.stack(xs[i + 1:], axis=-2)               # (..., n-i-1, k)
            s = s - jnp.einsum("...k,...kj->...j", L[..., i + 1:, i], Xi)
        xs[i] = s / L[..., i, i, None]
    return jnp.stack(xs, axis=-2)


def _gauss_jordan(A: jax.Array, B: jax.Array) -> jax.Array:
    """Solve A X = B by Gauss-Jordan elimination, row-vectorized.

    A: (..., n, n); B: (..., n, k).  n static.  O(n) HLO ops: each of the
    n elimination steps updates the whole augmented matrix with one
    outer-product — vector code on the VPU, jacfwd-friendly.
    """
    n = A.shape[-1]
    Ab = jnp.concatenate([A, B], axis=-1)           # (..., n, n+k)
    eye = jnp.eye(n, dtype=A.dtype)
    for kk in range(n):
        pivot_row = Ab[..., kk, :]                   # (..., n+k)
        pivot = Ab[..., kk, kk:kk + 1]               # (..., 1)
        factor = Ab[..., :, kk] / pivot              # (..., n)
        factor = factor - factor * eye[kk]           # zero at the pivot row
        Ab = Ab - factor[..., :, None] * pivot_row[..., None, :]
    diag = jnp.diagonal(Ab[..., :, :n], axis1=-2, axis2=-1)  # (..., n)
    return Ab[..., :, n:] / diag[..., :, None]


def solve_spd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for small SPD A (static size), TPU-fusable.

    A: (..., n, n); b: (..., n) or (..., n, k).
    """
    n = A.shape[-1]
    vec = b.ndim == A.ndim - 1
    if n == 1:
        return b / A[..., 0, 0, None] if vec else b / A[..., 0, 0, None, None]
    if n == 2:
        a, c = A[..., 0, 0], A[..., 0, 1]
        d = A[..., 1, 1]
        det = a * d - c * c
        if vec:
            b0, b1 = b[..., 0], b[..., 1]
            return jnp.stack([(d * b0 - c * b1) / det, (a * b1 - c * b0) / det], axis=-1)
        b0, b1 = b[..., 0, :], b[..., 1, :]
        return jnp.stack(
            [(d[..., None] * b0 - c[..., None] * b1) / det[..., None],
             (a[..., None] * b1 - c[..., None] * b0) / det[..., None]],
            axis=-2,
        )
    L = _chol_vec(A)
    x = _chol_solve_vec(L, b[..., None] if vec else b)
    return x[..., 0] if vec else x


def solve_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """General small solve (no pivoting — intended for diagonally
    dominant systems like the implicit-contact Newton matrix
    M + dt J^T D J).  A: (..., n, n), b: (..., n)."""
    n = A.shape[-1]
    if n == 1:
        return b / A[..., 0, 0, None]
    return _gauss_jordan(A, b[..., None])[..., 0]


def inv_spd(A: jax.Array) -> jax.Array:
    """Inverse of a small SPD matrix (static size)."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return solve_spd(A, eye)
