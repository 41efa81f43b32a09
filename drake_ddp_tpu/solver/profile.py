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
    warm = prob.K_init is not None
    state = _LoopState(
        x_bar=(prob.x_ref_init.astype(dtype) if warm
               else jnp.zeros((N, n), dtype)),
        u_bar=prob.u_init.astype(dtype),
        fx=jnp.zeros((N - 1, n, n), dtype),
        fu=jnp.zeros((N - 1, n, m), dtype),
        kappa=jnp.zeros((N - 1, m), dtype),
        K=(prob.K_init.astype(dtype) if warm
           else jnp.zeros((N - 1, m, n), dtype)),
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
                and not bool(state.diverged)
                and not (prob.frozen is not None and bool(prob.frozen)))
        if not cond:
            break

        eps, x, u, L_new, imp, ls_iters, failed, floor_cut = timed(
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
        at_optimum = ((float(jnp.sum(state.dV_coeff)) <= cfg.delta
                       or bool(floor_cut))
                      and int(state.iteration) > 0
                      and bool(jnp.isfinite(state.L)))
        exhausted = ((not adaptive) or float(state.reg) >= cfg.reg_max
                     or at_optimum)
        retry = failed_h and not exhausted
        diverged = failed_h and exhausted and not at_optimum

        if failed_h and int(state.iteration) > 0:
            fx, fu, percent = state.fx, state.fu, jnp.asarray(0.0, dtype)
        else:
            fx, fu, percent = timed(times.derivs, derivs_fn, x_use, u_use)
            if failed_h:
                percent = jnp.asarray(0.0, dtype)

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


def profiled_solve_batched(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    prob: ILQRProblem,
    rollout_kernel: str = "auto",
    deriv_kernel: str = "auto",
):
    """Host-stepped twin of :func:`solver.batched.solve_ilqr_batched`
    with per-phase device timing — THE tool for attributing iteration
    time at production batch on real hardware (e.g. the "derivative
    time < 25% of iteration" perf criterion): each phase (batched
    linesearch incl. the Pallas rollout kernels, Jacobian stack,
    Riccati sweeps) is a separately-jitted, blocked-on device call.

    Returns ``(ILQRSolution, PhaseTimes)``.  Semantics pinned to the
    fused batched solver by tests/test_aux.py.
    """
    from functools import partial

    from drake_ddp_tpu.solver import keypoints as kp
    from drake_ddp_tpu.solver.batched import (
        _fused_rollout_for,
        _lane_step_for,
        _linesearch_batched,
        _vary_like,
    )

    cfg.derivs.validate()
    step = system.bound_step()
    N = cfg.num_steps
    fused = _fused_rollout_for(system, rollout_kernel, N)
    step_T = _lane_step_for(system, "lane" if fused is not None
                            else rollout_kernel)
    B, n = prob.x0.shape
    m = prob.u_init.shape[-1]
    dtype = prob.x0.dtype

    # mirror solve_ilqr_batched's selection (root-seeded megajac on
    # TPU, root-seeded lane jac otherwise) so phase fractions measure
    # the production path
    from drake_ddp_tpu.solver.batched import _pallas_jac_for

    root = (system.lane_jac_root_fn is not None
            and deriv_kernel in ("auto", "lane", "megajac"))
    jac_T = ((system.lane_jac_root_fn if root else system.lane_jac_fn)
             if deriv_kernel in ("auto", "lane", "megajac") else None)
    if deriv_kernel in ("lane", "megajac") and jac_T is None:
        raise ValueError("system provides no lane_jac_fn")
    pjac = _pallas_jac_for(system, deriv_kernel, root=root) \
        if jac_T is not None else None
    if pjac is not None:
        jac_T = pjac
    if jac_T is not None:
        derivs_fn = partial(kp.compute_derivatives_batched, jac_T,
                            cfg.derivs, root=root)
    else:
        derivs_fn = jax.vmap(partial(kp.compute_derivatives, step,
                                     cfg.derivs))
    from drake_ddp_tpu.solver.ilqr import _backward_pass

    if cfg.parallel_backward:
        from drake_ddp_tpu.solver.parscan import parallel_backward_pass

        bp_one = lambda p, x, u, fx, fu, reg: parallel_backward_pass(
            cfg, p, x, u, fx, fu, reg=reg)
    else:
        bp_one = lambda p, x, u, fx, fu, reg: _backward_pass(
            cfg, p, x, u, fx, fu, reg=reg)
    bp_fn = jax.vmap(bp_one)
    adaptive = cfg.reg > 0.0

    ls_jit = jax.jit(lambda p, s: _linesearch_batched(step_T, cfg, p, s,
                                                      fused=fused))
    dv_jit = jax.jit(derivs_fn)
    bp_jit = jax.jit(bp_fn)

    def update(prob, state, ls_out, fx_new, fu_new, pct, kappa, K, dV,
               active):
        # bookkeeping of batched.forward_and_backward + the while-body
        # lane masking, verbatim
        eps, x, u, L_new, imp, ls_iters, failed, floor_cut = ls_out
        selb = lambda flag, a, b: jnp.where(
            flag.reshape((B,) + (1,) * (a.ndim - 1)), a, b)
        x_use = selb(failed, state.x_bar, x)
        u_use = selb(failed, state.u_bar, u)
        L_use = jnp.where(failed, state.L, L_new)
        if adaptive:
            reg_new = jnp.where(
                failed,
                state.reg * cfg.reg_mult,
                jnp.maximum(state.reg / cfg.reg_mult, cfg.reg),
            )
        else:
            reg_new = state.reg
        at_optimum = ((jnp.sum(state.dV_coeff, axis=1) <= cfg.delta)
                      | floor_cut) & (state.iteration > 0) & jnp.isfinite(
                          state.L)
        exhausted = jnp.asarray(
            not adaptive) | (state.reg >= cfg.reg_max) | at_optimum
        retry = failed & ~exhausted
        diverged = failed & exhausted & ~at_optimum
        cache_ok = failed & (state.iteration > 0)  # see batched.py
        fx = selb(cache_ok, state.fx, fx_new)
        fu = selb(cache_ok, state.fu, fu_new)
        percent = jnp.where(failed, jnp.zeros_like(pct), pct)
        it = state.iteration
        put = lambda tab, v: tab.at[jnp.arange(B), it].set(v)
        stats = ILQRStats(
            cost=put(state.stats.cost, L_use),
            eps=put(state.stats.eps,
                    jnp.where(failed, jnp.zeros_like(eps), eps)),
            ls_iters=put(state.stats.ls_iters, ls_iters),
            percent_derivs=put(state.stats.percent_derivs, percent),
        )
        improvement = jnp.where(failed, jnp.asarray(0.0, dtype), imp)
        new = _LoopState(
            x_bar=x_use, u_bar=u_use, fx=fx, fu=fu, kappa=kappa, K=K,
            dV_coeff=dV, L=L_use, improvement=improvement,
            iteration=it + 1, reg=reg_new, retry=retry,
            diverged=diverged, stats=stats,
        )
        sel = lambda a, b: jnp.where(
            active.reshape((B,) + (1,) * (a.ndim - 1)), a, b) \
            if a.ndim else jnp.where(active, a, b)
        return jax.tree_util.tree_map(sel, new, state)

    update_jit = jax.jit(update)

    def lane_cond(state):
        c = (
            ((state.improvement > cfg.delta) | state.retry)
            & (state.iteration < cfg.max_iters)
            & ~state.diverged
        )
        if prob.frozen is not None:
            c = c & ~prob.frozen
        return c

    stats0 = ILQRStats(
        cost=jnp.zeros((B, cfg.max_iters), dtype),
        eps=jnp.zeros((B, cfg.max_iters), dtype),
        ls_iters=jnp.zeros((B, cfg.max_iters), jnp.int32),
        percent_derivs=jnp.zeros((B, cfg.max_iters), dtype),
    )
    warm = prob.K_init is not None
    state = _vary_like(_LoopState(
        x_bar=(prob.x_ref_init.astype(dtype) if warm
               else jnp.zeros((B, N, n), dtype)),
        u_bar=prob.u_init.astype(dtype),
        fx=jnp.zeros((B, N - 1, n, n), dtype),
        fu=jnp.zeros((B, N - 1, n, m), dtype),
        kappa=jnp.zeros((B, N - 1, m), dtype),
        K=(prob.K_init.astype(dtype) if warm
           else jnp.zeros((B, N - 1, m, n), dtype)),
        dV_coeff=jnp.zeros((B, N - 1), dtype),
        L=jnp.full((B,), jnp.inf, dtype),
        improvement=jnp.full((B,), jnp.inf, dtype),
        iteration=jnp.zeros((B,), jnp.int32),
        reg=jnp.full((B,), cfg.reg, dtype),
        retry=jnp.zeros((B,), bool),
        diverged=jnp.zeros((B,), bool),
        stats=stats0,
    ), prob.x0)

    # warm all executables (compile excluded from timings)
    ls0 = jax.block_until_ready(ls_jit(prob, state))
    d0 = jax.block_until_ready(dv_jit(state.x_bar, state.u_bar))
    b0 = jax.block_until_ready(
        bp_jit(prob, state.x_bar, state.u_bar, state.fx, state.fu,
               state.reg))
    jax.block_until_ready(update_jit(
        prob, state, ls0, d0[0], d0[1], d0[2], b0[0], b0[1], b0[2],
        jnp.zeros((B,), bool)))

    times = PhaseTimes([], [], [])

    def timed(bucket, fn, *args):
        st = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        bucket.append(time.perf_counter() - st)
        return out

    while bool(jnp.any(lane_cond(state))):
        active = lane_cond(state)
        ls_out = timed(times.forward, ls_jit, prob, state)
        fx_new, fu_new, pct = timed(times.derivs, dv_jit,
                                    jnp.where(ls_out[6][:, None, None],
                                              state.x_bar, ls_out[1]),
                                    jnp.where(ls_out[6][:, None, None],
                                              state.u_bar, ls_out[2]))
        # backward pass inputs must match the fused solver: reg_new and
        # masked trajectories; recompute cheaply here (untimed jnp)
        failed = ls_out[6]
        x_use = jnp.where(failed[:, None, None], state.x_bar, ls_out[1])
        u_use = jnp.where(failed[:, None, None], state.u_bar, ls_out[2])
        if adaptive:
            reg_new = jnp.where(
                failed, state.reg * cfg.reg_mult,
                jnp.maximum(state.reg / cfg.reg_mult, cfg.reg))
        else:
            reg_new = state.reg
        fx = jnp.where(failed[:, None, None, None], state.fx, fx_new)
        fu = jnp.where(failed[:, None, None, None], state.fu, fu_new)
        kappa, K, dV = timed(times.backward, bp_jit, prob, x_use, u_use,
                             fx, fu, reg_new)
        state = update_jit(prob, state, ls_out, fx_new, fu_new, pct,
                           kappa, K, dV, active)

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
