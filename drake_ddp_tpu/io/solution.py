"""Solution persistence: the time-varying LQR policy as an .npz archive.

Format parity with the reference's ``SaveSolution`` (ilqr.py:712-733):
arrays ``t (N-1,)``, ``x_bar (n, N-1)`` (last step dropped),
``u_bar (m, N-1)``, ``K (m, n, N-1)``.  The saved artifact is exactly a
time-varying LQR policy: u(t) = u_bar[t] - K[t] (x - x_bar[t]).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def save_solution(fname: str, dt: float, x: np.ndarray, u: np.ndarray,
                  K: np.ndarray) -> None:
    """Write the reference-format archive.

    Args:
        fname: output path (.npz appended by numpy if missing).
        dt: timestep (reference reads it from the plant, ilqr.py:725).
        x: (n, N) state trajectory (reference layout).
        u: (m, N-1) control tape.
        K: (m, n, N-1) feedback gains.
    """
    N = x.shape[1]
    t = np.arange(0.0, (N - 1) * dt, dt)
    np.savez(fname, t=t, x_bar=x[:, :-1], u_bar=u, K=K)


def load_solution(fname: str) -> Dict[str, np.ndarray]:
    """Load a saved solution (reference kinova_gen3.py:292-296 replay
    path).  Returns dict with t, x_bar, u_bar, K."""
    data = np.load(fname)
    return {k: data[k] for k in ("t", "x_bar", "u_bar", "K")}


def policy(sol: Dict[str, np.ndarray]):
    """Wrap a loaded solution as the feedback law u(t_index, x)."""
    x_bar, u_bar, K = sol["x_bar"], sol["u_bar"], sol["K"]

    def act(i: int, x: np.ndarray) -> np.ndarray:
        return u_bar[:, i] - K[:, :, i] @ (x - x_bar[:, i])

    return act
