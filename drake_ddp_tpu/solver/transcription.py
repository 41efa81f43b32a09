"""Direct transcription baseline: the reference's SQP comparison path.

The reference offers a second solver route through Drake's
``DirectTranscription`` + ``MathematicalProgram`` (SNOPT/OSQP SQP) for
the pendulum / cart-pole / acrobot examples (pendulum.py:109-141,
cart_pole.py:131-163, acrobot.py:173-205; SURVEY.md D6) as a
*comparison tool*, not a core capability.

TPU-native equivalent: transcribe states and controls as decision
variables, enforce dynamics defects with an increasing quadratic penalty
(a classic penalty-SQP homotopy), and solve each penalty subproblem with
Adam followed by a Gauss-Newton polish — all batched/jit-compiled.  The
optimum satisfies the same first-order conditions as the constrained
program as rho -> inf; by default we report the *rollout* cost of the
transcribed controls so results are directly comparable with iLQR's.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

import optax

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.solver.ilqr import ILQRProblem, _total_cost


class TranscriptionConfig(NamedTuple):
    """Penalty-method direct transcription settings.

    num_steps: horizon N (same convention as ILQRConfig).
    rho_init/rho_mult/num_rounds: defect-penalty homotopy rho_k =
        rho_init * rho_mult^k for num_rounds rounds.
    inner_steps: Adam steps per round.
    lr: Adam learning rate.
    gn_steps: Levenberg-Marquardt (damped Gauss-Newton) polish steps per
        round — the penalized program is a nonlinear least-squares, which
        is exactly what Drake's SQP exploits; first-order steps alone
        plateau on the stiff terminal cost.
    gn_damping: LM damping added to the normal equations.
    """

    num_steps: int
    rho_init: float = 0.1
    rho_mult: float = 10.0
    num_rounds: int = 6
    inner_steps: int = 300
    lr: float = 0.05
    gn_steps: int = 4
    gn_damping: float = 1e-6


class TranscriptionSolution(NamedTuple):
    x: jax.Array             # (N, n) transcribed states (the reference's
                             # GetStateSamples contract, pendulum.py:140)
    u: jax.Array             # (N-1, m) control tape
    cost: jax.Array          # cost of the transcribed (x, u)
    defect: jax.Array        # max dynamics defect of the transcribed vars
    rollout_cost: jax.Array  # cost of open-loop rollout of u (diagnostic;
                             # compounds defects on unstable systems)
    objective: jax.Array     # final penalized objective


def solve_transcription(
    system: DiscreteSystem,
    cfg: TranscriptionConfig,
    prob: ILQRProblem,
) -> TranscriptionSolution:
    """Solve min_{x,u} cost(x, u) + rho ||x_{t+1} - f(x_t, u_t)||^2 with
    x_0 fixed (the DirectTranscription program of pendulum.py:113-126),
    rho increasing.  Pure function: jit/vmap over ``prob``."""
    step = system.bound_step()
    N = cfg.num_steps
    n = prob.x0.shape[-1]
    m = prob.u_init.shape[-1]
    dtype = prob.x0.dtype

    def rollout(u):
        def body(x, ut):
            xn = step(x, ut)
            return xn, xn
        _, xs = jax.lax.scan(body, prob.x0, u)
        return jnp.concatenate([prob.x0[None], xs], axis=0)

    def objective(z, rho):
        xs, u = z
        x_full = jnp.concatenate([prob.x0[None], xs], axis=0)  # (N, n)
        cost = _total_cost(prob, x_full, u)
        pred = jax.vmap(step)(x_full[:-1], u)
        defects = pred - x_full[1:]
        return cost + rho * jnp.sum(defects * defects)

    # Matrix square roots of the (constant, symmetric PSD) cost weights
    # for the least-squares residual form.
    def _sqrtm(A):
        w, V = jnp.linalg.eigh(A)
        return (V * jnp.sqrt(jnp.maximum(w, 0.0))) @ V.T

    sq_Q, sq_R, sq_Qf = _sqrtm(prob.Q), _sqrtm(prob.R), _sqrtm(prob.Qf)

    def residuals(z_flat, rho):
        """The penalized objective as a residual vector: objective ==
        sum(residuals^2)."""
        xs = z_flat[: (N - 1) * n].reshape(N - 1, n)
        u = z_flat[(N - 1) * n:].reshape(N - 1, m)
        x_full = jnp.concatenate([prob.x0[None], xs], axis=0)
        pred = jax.vmap(step)(x_full[:-1], u)
        return jnp.concatenate([
            ((x_full[:-1] - prob.x_nom) @ sq_Q.T).ravel(),
            (u @ sq_R.T).ravel(),
            jnp.sqrt(rho) * (pred - x_full[1:]).ravel(),
            sq_Qf @ (x_full[-1] - prob.x_nom),
        ])

    def gn_polish(z, rho):
        """Damped Gauss-Newton on the residual form (one linearization +
        normal-equation solve per step)."""
        z_flat = jnp.concatenate([z[0].ravel(), z[1].ravel()])
        dim = z_flat.shape[0]
        eye = jnp.eye(dim, dtype=dtype)

        def gn_step(zf, _):
            r = residuals(zf, rho)
            J = jax.jacfwd(residuals)(zf, rho)
            H = J.T @ J + cfg.gn_damping * eye
            g = J.T @ r
            dz = jnp.linalg.solve(H, g)
            zf_new = zf - dz
            # accept only if the objective decreased (LM safeguard)
            better = jnp.sum(residuals(zf_new, rho) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, zf_new, zf), None

        z_flat, _ = jax.lax.scan(gn_step, z_flat, None, length=cfg.gn_steps)
        return (z_flat[: (N - 1) * n].reshape(N - 1, n),
                z_flat[(N - 1) * n:].reshape(N - 1, m))

    # Initialize from the rollout of the initial control tape.
    u0 = prob.u_init.astype(dtype)
    z = (rollout(u0)[1:], u0)

    opt = optax.adam(cfg.lr)

    def round_body(z, rho):
        state = opt.init(z)

        def inner(carry, _):
            z, state = carry
            g = jax.grad(objective)(z, rho)
            updates, state = opt.update(g, state)
            z = optax.apply_updates(z, updates)
            return (z, state), None

        (z, _), _ = jax.lax.scan(inner, (z, state), None,
                                 length=cfg.inner_steps)
        return z, rho

    rhos = cfg.rho_init * (cfg.rho_mult ** jnp.arange(cfg.num_rounds,
                                                      dtype=dtype))
    def scan_round(z, rho):
        z, _ = round_body(z, rho)
        if cfg.gn_steps > 0:
            z = gn_polish(z, rho)
        return z, None

    z, _ = jax.lax.scan(scan_round, z, rhos)
    xs, u = z

    x_full = jnp.concatenate([prob.x0[None], xs], axis=0)
    pred = jax.vmap(step)(x_full[:-1], u)
    defect = jnp.max(jnp.abs(pred - x_full[1:]))

    x_roll = rollout(u)
    return TranscriptionSolution(
        x=x_full, u=u,
        cost=_total_cost(prob, x_full, u),
        defect=defect,
        rollout_cost=_total_cost(prob, x_roll, u),
        objective=objective(z, rhos[-1]),
    )
