"""A plain-NumPy mirror of the reference algorithm's *specification*.

Used as golden data for parity tests: pydrake isn't installed in CI, so
we validate the JAX solver against an independent, eager, float64 NumPy
implementation of the same math (iLQR update equations, linesearch
schedule, and keypoint selection rules as documented in SURVEY.md §2/§3).
This file intentionally mirrors behavior, not code.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Keypoint selection (spec: SURVEY.md C1i-C1k)
# ---------------------------------------------------------------------------

def keypoints_set_interval(N, minN):
    pts = np.arange(0, N - 1, minN).astype(int)
    if pts[-1] != N - 2:
        pts[-1] = N - 2
    return list(pts)


def jerk_profile(x, N, n):
    dof = n // 2
    vel = x[:, n - dof:]
    out = np.zeros((N - 3, dof))
    for t in range(N - 3):
        out[t] = (vel[t + 2] - vel[t + 1]) - (vel[t + 1] - vel[t])
    return out


def keypoints_adaptive_jerk(x, N, n, minN, maxN, jerk_threshold):
    jerk = jerk_profile(x, N, n)
    keypoints = [0]
    counter = 0
    for t in range(len(jerk)):
        counter += 1
        if counter >= minN:
            if np.any(jerk[t] > jerk_threshold):
                keypoints.append(t)
                counter = 0
        if counter >= maxN:
            keypoints.append(t)
            counter = 0
    if keypoints[-1] != N - 2:
        keypoints[-1] = N - 2
    return keypoints


def keypoints_iterative_error(fx_full, N, minN, threshold):
    """Adaptive bisection on a precomputed fx stack; returns the visited
    (evaluated) index set, which is the reference's keypoint list."""
    n = fx_full.shape[-1]
    visited = np.zeros(N - 1, dtype=bool)

    def check(s, e):
        if e - s <= minN:
            return True
        m = (s + e) // 2
        visited[s] = visited[m] = visited[e] = True
        approx = 0.5 * (fx_full[s] + fx_full[e])
        err = np.sum((approx - fx_full[m]) ** 2) / (2 * n)
        return err <= threshold

    segments = [(0, N - 2)]
    while segments:
        nxt = []
        for (s, e) in segments:
            if not check(s, e):
                m = (s + e) // 2
                nxt.append((s, m))
                nxt.append((m, e))
        segments = nxt
    return [i for i in range(N - 1) if visited[i]]


def interpolate(keypoints, vals):
    out = np.array(vals, copy=True)
    kps = sorted(set(keypoints))
    for a, b in zip(kps[:-1], kps[1:]):
        for j in range(a, b):
            out[j] = vals[a] + (vals[b] - vals[a]) * (j - a) / (b - a)
    return out


# ---------------------------------------------------------------------------
# iLQR (spec: SURVEY.md C1, §3.1) — eager float64, time-major arrays.
# ---------------------------------------------------------------------------

def solve_ilqr_np(
    step,          # step(x, u) -> x_next
    N, x0, x_nom, Q, R, Qf, u_init,
    delta=1e-2, beta=0.95, gamma=0.0, max_iters=100,
):
    n = x0.shape[0]
    m = u_init.shape[1]
    x_bar = np.zeros((N, n))
    u_bar = np.array(u_init, dtype=float)
    kappa = np.zeros((N - 1, m))
    K = np.zeros((N - 1, m, n))
    dV = np.zeros(N - 1)

    history = []

    def rollout(eps):
        x = np.zeros((N, n))
        u = np.zeros((N - 1, m))
        x[0] = x0
        L = 0.0
        for t in range(N - 1):
            u[t] = u_bar[t] - eps * kappa[t] - K[t] @ (x[t] - x_bar[t])
            x[t + 1] = step(x[t], u[t])
            dx = x[t] - x_nom
            L += dx @ Q @ dx + u[t] @ R @ u[t]
        dxf = x[-1] - x_nom
        L += dxf @ Qf @ dxf
        return x, u, L

    def linesearch(L_last):
        eps = 1.0
        iters = 0
        while eps >= 1e-8:
            iters += 1
            x, u, L = rollout(eps)
            expected = np.sum(-eps * (1 - eps / 2) * dV)
            if (L_last - L) > gamma * expected:
                return eps, x, u, L, iters
            eps *= beta
        raise RuntimeError("linesearch failed")

    def derivatives(x, u, fd_eps=1e-6):
        fx = np.zeros((N - 1, n, n))
        fu = np.zeros((N - 1, n, m))
        for t in range(N - 1):
            base = step(x[t], u[t])
            for i in range(n):
                dxp = x[t].copy(); dxp[i] += fd_eps
                dxm = x[t].copy(); dxm[i] -= fd_eps
                fx[t][:, i] = (step(dxp, u[t]) - step(dxm, u[t])) / (2 * fd_eps)
            for i in range(m):
                dup = u[t].copy(); dup[i] += fd_eps
                dum = u[t].copy(); dum[i] -= fd_eps
                fu[t][:, i] = (step(x[t], dup) - step(x[t], dum)) / (2 * fd_eps)
        return fx, fu

    def backward(x, u, fx, fu):
        Vx = 2 * Qf @ (x[-1] - x_nom)
        Vxx = 2 * Qf
        for t in range(N - 2, -1, -1):
            lx = 2 * Q @ (x[t] - x_nom)
            lu = 2 * R @ u[t]
            Qx = lx + fx[t].T @ Vx
            Qu = lu + fu[t].T @ Vx
            Qxx = 2 * Q + fx[t].T @ Vxx @ fx[t]
            Quu = 2 * R + fu[t].T @ Vxx @ fu[t]
            Quu_inv = np.linalg.inv(Quu)
            Qux = fu[t].T @ Vxx @ fx[t]
            kappa[t] = Quu_inv @ Qu
            K[t] = Quu_inv @ Qux
            dV[t] = Qu @ Quu_inv @ Qu
            Vx = Qx - Qu @ Quu_inv @ Qux
            Vxx = Qxx - Qux.T @ Quu_inv @ Qux

    L = np.inf
    improvement = np.inf
    i = 0
    while improvement > delta and i < max_iters:
        eps, x, u, L_new, ls_iters = linesearch(L)
        fx, fu = derivatives(x, u)
        x_bar, u_bar = x, u
        backward(x, u, fx, fu)
        improvement = L - L_new
        L = L_new
        history.append(dict(cost=L_new, eps=eps, ls_iters=ls_iters))
        i += 1

    return x_bar, u_bar, L, history
