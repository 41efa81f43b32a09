"""Per-phase timed iLQR solve (reference's solver-phase timers).

The reference brackets each solver phase with wall-clock timers and
reports per-iteration ``time_fp`` / ``time_getDerivs`` / ``time_bp``
columns (reference ilqr.py:364-372, 685-704).  The production TPU solve
(:func:`solver.ilqr.solve_ilqr`) fuses the whole outer loop into one XLA
program, where host timers cannot see phase boundaries — so this module
provides the profiling twin: the SAME phase implementations
(``_linesearch``, ``keypoints.compute_derivatives``, ``_backward_pass``)
driven by a host-level outer loop, each phase a separately-jitted,
blocked-on device call.  Semantics are pinned to ``solve_ilqr`` by
tests/test_aux.py; use it to answer "where does the iteration go" (e.g.
the VERDICT criterion "derivative time < 25% of iteration"), then run
the fused solver for production.

Caveats (why this is a profiling mode, not the default):
- one device round-trip per phase per iteration (~ms each under the
  axon tunnel) — the fused solver has zero;
- phases are compiled separately, so cross-phase XLA fusion is lost.
Both effects make the *sum* here an upper bound on the fused solve's
iteration time; the *ratios* between phases are the useful signal.
"""

from __future__ import annotations

import time
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.solver import keypoints as kp
from drake_ddp_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRProblem,
    ILQRSolution,
    ILQRStats,
    _backward_pass,
    _linesearch,
    _LoopState,
)


class PhaseTimes(NamedTuple):
    """Per-iteration phase seconds (device time, host-blocked)."""

    forward: List[float]      # linesearch rollouts (reference time_fp)
    derivs: List[float]       # Jacobian stack (reference time_getDerivs)
    backward: List[float]     # Riccati sweep (reference time_bp)

    def totals(self):
        return {
            "forward": float(sum(self.forward)),
            "derivs": float(sum(self.derivs)),
            "backward": float(sum(self.backward)),
        }

    def fractions(self):
        t = self.totals()
        s = max(sum(t.values()), 1e-12)
        return {k: v / s for k, v in t.items()}


def profiled_solve(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    prob: ILQRProblem,
):
    """Host-stepped iLQR with per-phase timing.

    Returns ``(ILQRSolution, PhaseTimes)``.  The solution matches
    :func:`solve_ilqr` (same phase code, same update rules; the only
    difference is host vs ``lax.while_loop`` orchestration).
    """
    cfg.derivs.validate()
    step = system.bound_step()
    N = cfg.num_steps
    n, m = prob.x0.shape[-1], prob.u_init.shape[-1]
    dtype = prob.x0.dtype
    adaptive = cfg.reg > 0.0

    from functools import partial

    ls_fn = jax.jit(partial(_linesearch, step, cfg))
    derivs_fn = jax.jit(partial(kp.compute_derivatives, step, cfg.derivs))
    if cfg.parallel_backward:
        from drake_ddp_tpu.solver.parscan import parallel_backward_pass

        bp_fn = jax.jit(
            lambda prob, x, u, fx, fu, reg: parallel_backward_pass(
                cfg, prob, x, u, fx, fu, reg=reg))
    else:
        bp_fn = jax.jit(
            lambda prob, x, u, fx, fu, reg: _backward_pass(
                cfg, prob, x, u, fx, fu, reg=reg))

    stats0 = ILQRStats(
        cost=jnp.zeros(cfg.max_iters, dtype),
        eps=jnp.zeros(cfg.max_iters, dtype),
        ls_iters=jnp.zeros(cfg.max_iters, jnp.int32),
        percent_derivs=jnp.zeros(cfg.max_iters, dtype),
    )
    state = _LoopState(
        x_bar=jnp.zeros((N, n), dtype),
        u_bar=prob.u_init.astype(dtype),
        fx=jnp.zeros((N - 1, n, n), dtype),
        fu=jnp.zeros((N - 1, n, m), dtype),
        kappa=jnp.zeros((N - 1, m), dtype),
        K=jnp.zeros((N - 1, m, n), dtype),
        dV_coeff=jnp.zeros(N - 1, dtype),
        L=jnp.asarray(jnp.inf, dtype),
        improvement=jnp.asarray(jnp.inf, dtype),
        iteration=jnp.asarray(0, jnp.int32),
        reg=jnp.asarray(cfg.reg, dtype),
        retry=jnp.asarray(False),
        diverged=jnp.asarray(False),
        stats=stats0,
    )

    # Warm every phase executable so iteration 1's timings are compute,
    # not compile (first-compile under axon is minutes; see CLAUDE.md).
    jax.block_until_ready(ls_fn(prob, state))
    jax.block_until_ready(derivs_fn(state.x_bar, state.u_bar))
    jax.block_until_ready(
        bp_fn(prob, state.x_bar, state.u_bar, state.fx, state.fu,
              state.reg))

    times = PhaseTimes([], [], [])

    def timed(bucket, fn, *args):
        st = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        bucket.append(time.perf_counter() - st)
        return out

    # Host replay of solve_ilqr's forward_and_backward/cond (ilqr.py:394-
    # 505).  Control flow is pulled to the host scalar-by-scalar — cheap
    # relative to the phases being timed.
    while True:
        cond = ((float(state.improvement) > cfg.delta or bool(state.retry))
                and int(state.iteration) < cfg.max_iters
                and not bool(state.diverged))
        if not cond:
            break

        eps, x, u, L_new, imp, ls_iters, failed = timed(
            times.forward, ls_fn, prob, state)
        failed_h = bool(failed)

        sel = lambda a, b: b if failed_h else a
        x_use = sel(x, state.x_bar)
        u_use = sel(u, state.u_bar)
        L_use = sel(L_new, state.L)

        if adaptive:
            reg_new = (state.reg * cfg.reg_mult if failed_h
                       else jnp.maximum(state.reg / cfg.reg_mult, cfg.reg))
        else:
            reg_new = state.reg
        at_optimum = (float(jnp.sum(state.dV_coeff)) <= cfg.delta
                      and int(state.iteration) > 0)
        exhausted = ((not adaptive) or float(state.reg) >= cfg.reg_max
                     or at_optimum)
        retry = failed_h and not exhausted
        diverged = failed_h and exhausted and not at_optimum

        if failed_h:
            fx, fu, percent = state.fx, state.fu, jnp.asarray(0.0, dtype)
        else:
            fx, fu, percent = timed(times.derivs, derivs_fn, x_use, u_use)

        kappa, K, dV = timed(times.backward, bp_fn, prob, x_use, u_use,
                             fx, fu, jnp.asarray(reg_new, dtype))

        it = int(state.iteration)
        stats = ILQRStats(
            cost=state.stats.cost.at[it].set(L_use),
            eps=state.stats.eps.at[it].set(
                jnp.zeros_like(eps) if failed_h else eps),
            ls_iters=state.stats.ls_iters.at[it].set(ls_iters),
            percent_derivs=state.stats.percent_derivs.at[it].set(percent),
        )
        state = _LoopState(
            x_bar=x_use, u_bar=u_use, fx=fx, fu=fu, kappa=kappa, K=K,
            dV_coeff=dV, L=jnp.asarray(L_use, dtype),
            improvement=jnp.asarray(0.0 if failed_h else float(imp), dtype),
            iteration=jnp.asarray(it + 1, jnp.int32),
            reg=jnp.asarray(reg_new, dtype),
            retry=jnp.asarray(retry), diverged=jnp.asarray(diverged),
            stats=stats,
        )

    sol = ILQRSolution(
        x=state.x_bar, u=state.u_bar, K=state.K, kappa=state.kappa,
        cost=state.L, iterations=state.iteration,
        diverged=state.diverged, stats=state.stats,
    )
    return sol, times


def format_phase_table(sol: ILQRSolution, times: PhaseTimes) -> str:
    """Reference-style iteration table WITH the per-phase timing columns
    (reference ilqr.py:685-704: iter/cost/eps/ls/time_fp/time_derivs/
    time_bp)."""
    stats = sol.stats
    it = int(sol.iterations)
    bar = "-" * 92
    lines = [bar,
             "| iter |    cost    |   eps   | ls | derivs % | "
             "time_fp  | time_derivs | time_bp  |",
             bar]
    for i in range(it):
        tf = times.forward[i] if i < len(times.forward) else 0.0
        td = times.derivs[i] if i < len(times.derivs) else 0.0
        tb = times.backward[i] if i < len(times.backward) else 0.0
        lines.append(
            f"{i + 1:^8}{float(stats.cost[i]):11.4f} "
            f"{float(stats.eps[i]):^9.4f}{int(stats.ls_iters[i]):^5}"
            f"{float(stats.percent_derivs[i]):^9.1f} "
            f"{tf:9.4f}  {td:11.4f} {tb:9.4f}")
    t = times.totals()
    tot = sum(t.values())
    lines.append(bar)
    lines.append(
        "phase totals: forward %.4f s (%.0f%%), derivs %.4f s (%.0f%%), "
        "backward %.4f s (%.0f%%)" % (
            t["forward"], 100.0 * t["forward"] / max(tot, 1e-12),
            t["derivs"], 100.0 * t["derivs"] / max(tot, 1e-12),
            t["backward"], 100.0 * t["backward"] / max(tot, 1e-12)))
    return "\n".join(lines)
