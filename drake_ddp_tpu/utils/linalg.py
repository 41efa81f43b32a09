"""Small symmetric-positive-definite solves tuned for TPU.

``jnp.linalg.solve`` lowers to an LU custom call that costs ~1.5 ms per
invocation on TPU even for a 2x2 — catastrophic inside a per-timestep
``lax.scan`` (measured: a 100-step rollout goes 150 ms -> 28 ms when the
2x2 solve is replaced with the closed form).  Multibody mass matrices and
iLQR's Quu are SPD and tiny (n <= ~20), so we use closed forms for n <= 3
and an unrolled in-register Cholesky otherwise — straight-line VPU code
that XLA fuses into the surrounding scan body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chol_unrolled(A: jax.Array) -> jax.Array:
    """Lower Cholesky factor of a small SPD matrix via statically unrolled
    Cholesky–Crout.  O(n^3) straight-line ops; fine for n <= ~32."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_diag = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_diag
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else jnp.zeros_like(A[..., 0, 0]) for j in range(n)],
            axis=-1,
        )
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def _chol_solve_unrolled(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L L^T x = b with statically unrolled triangular solves.
    b: (..., n) or (..., n, k)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    # forward: L y = b
    ys = []
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[..., i, k, None] * ys[k]
        ys.append(s / L[..., i, i, None])
    # backward: L^T x = y
    xs = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i, None] * xs[k]
        xs[i] = s / L[..., i, i, None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


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
    L = _chol_unrolled(A)
    return _chol_solve_unrolled(L, b)


def solve_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """General small solve via statically unrolled Gaussian elimination
    (no pivoting — intended for diagonally dominant systems like the
    implicit-contact Newton matrix M + dt J^T D J).  A: (..., n, n),
    b: (..., n)."""
    n = A.shape[-1]
    if n == 1:
        return b / A[..., 0, 0, None]
    rows = [[A[..., i, j] for j in range(n)] for i in range(n)]
    rhs = [b[..., i] for i in range(n)]
    for k in range(n):
        inv_p = 1.0 / rows[k][k]
        for i in range(k + 1, n):
            f = rows[i][k] * inv_p
            for j in range(k + 1, n):
                rows[i][j] = rows[i][j] - f * rows[k][j]
            rhs[i] = rhs[i] - f * rhs[k]
    xs = [None] * n
    for i in reversed(range(n)):
        s = rhs[i]
        for j in range(i + 1, n):
            s = s - rows[i][j] * xs[j]
        xs[i] = s / rows[i][i]
    return jnp.stack(xs, axis=-1)


def inv_spd(A: jax.Array) -> jax.Array:
    """Inverse of a small SPD matrix (static size)."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return solve_spd(A, eye)
