"""Natively-batched iLQR driver with a lane-major / Pallas rollout.

``jax.vmap(solve_ilqr)`` is semantically perfect but leaves the
linesearch rollout in a batch-first layout whose XLA lowering is
movement-bound (see multibody/lanestep.py).  This module is the same
solver with the scenario batch as an EXPLICIT leading axis:

- the closed-loop linesearch rollout runs through the system's
  lane-major step — by default the Pallas mega-step kernel
  (ops/megastep.py), measured ~4x faster than the vmapped XLA rollout
  on the flagship benchmark — with linesearch candidates folded into
  the lane axis,
- derivative computation and the Riccati backward pass reuse the
  per-scenario implementations under ``jax.vmap`` (they are not
  movement-bound),
- both while_loops replicate exactly what vmap makes of a batched
  while_loop: iterate while ANY lane is active, freeze the carry of
  inactive lanes.

Semantics (accepted eps, improvement tests, adaptive regularization,
divergence flags) mirror solver/ilqr.py line for line; equivalence is
pinned by tests/test_batched_solver.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

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
    _cost_steps,
)


def _lane_step_for(system: DiscreteSystem, rollout_kernel: str,
                   block_b: int = 128) -> Callable:
    """Pick the lane-major step implementation: 'pallas' | 'lane' | 'auto'."""
    lane = system.lane_step_fn
    if lane is None:
        from drake_ddp_tpu.multibody.lanestep import lane_step_from_scalar

        return lane_step_from_scalar(system.bound_step())
    if rollout_kernel == "lane":
        return lane
    if rollout_kernel == "auto" and jax.default_backend() not in (
            "tpu", "axon"):
        return lane  # pallas compiles for TPU only; CPU tests use lane
    try:
        from drake_ddp_tpu.ops.megastep import pallas_step_for_system

        pstep = pallas_step_for_system(system, block_b=block_b)
    except Exception:
        if rollout_kernel == "pallas":
            raise
        return lane
    if pstep is None:
        return lane

    def step(x_T, u_T):
        B = x_T.shape[-1]
        pad = (-B) % block_b
        if pad:
            x_T = jnp.concatenate(
                [x_T, jnp.zeros((x_T.shape[0], pad), x_T.dtype)], -1)
            u_T = jnp.concatenate(
                [u_T, jnp.zeros((u_T.shape[0], pad), u_T.dtype)], -1)
        out = pstep(x_T, u_T)
        return out[:, :B] if pad else out

    return step


# Which rollout/derivative paths the last solve_ilqr_batched build
# actually selected (trace-time Python, so readable after jit tracing).
# Keys: "rollout" ('fused' | 'megastep' | 'lane'), "derivs" ('megajac' |
# 'lane' | 'xla'), "fallback_reason" / "derivs_fallback_reason"
# (exception summary when 'auto' degraded, else None).  bench.py reports
# them in its detail.
KERNEL_SELECTION = {"rollout": None, "fallback_reason": None,
                    "derivs": None, "derivs_fallback_reason": None,
                    "derivs_root": None}

_PREFLIGHT_OK: set = set()


def _pallas_jac_for(system: DiscreteSystem, deriv_kernel: str,
                    root: bool = False, block_b: int = 128):
    """The Pallas structured-IFT Jacobian kernel (ops/megajac.py), when
    available.  None = use the lane-major XLA jac.  Same preflight-AOT
    + fallback discipline as _fused_rollout_for: Mosaic failures must
    degrade 'auto' instead of killing the whole program compile."""
    if deriv_kernel not in ("auto", "megajac"):
        return None
    if deriv_kernel == "auto" and jax.default_backend() not in (
            "tpu", "axon"):
        return None  # pallas compiles for TPU only; CPU tests use lane
    try:
        from drake_ddp_tpu.ops.megajac import pallas_jac_for_system

        pjac = pallas_jac_for_system(system, block_b=block_b,
                                     root_seed=root)
        if pjac is None:
            return None
        key = ("jac", id(system), block_b, root)
        if (deriv_kernel == "auto" and key not in _PREFLIGHT_OK
                and jax.default_backend() in ("tpu", "axon")):
            s = lambda *sh: jax.ShapeDtypeStruct(sh, jnp.float32)
            specs = [s(system.n, block_b), s(system.m, block_b)]
            if root:
                specs.append(s(system.n, block_b))
            jax.jit(pjac).lower(*specs).compile()
            _PREFLIGHT_OK.add(key)
        return pjac
    except Exception as e:
        if deriv_kernel == "megajac":
            raise
        KERNEL_SELECTION["derivs_fallback_reason"] = (
            f"{type(e).__name__}: {str(e)[:300]}")
        return None


def _fused_rollout_for(system: DiscreteSystem, rollout_kernel: str,
                       num_steps: int, block_b: int = 128):
    """The fused whole-horizon Pallas rollout (ops/megaroll.py), when
    available — one kernel per linesearch chunk instead of N-1 per-step
    launches.  None = use the per-step scan path.

    On TPU the fused kernel is pre-flight AOT-compiled at one-tile
    shapes before being selected: Mosaic legality failures only surface
    at compile time of the *whole* program (which is how the r02 bench
    went rc=1 instead of degrading), so 'auto' compiles the kernel alone
    first and falls back to the per-step path on any failure.
    'fused' (explicit) still raises.
    """
    if rollout_kernel not in ("auto", "fused"):
        return None
    if rollout_kernel == "auto" and jax.default_backend() not in (
            "tpu", "axon"):
        return None  # pallas compiles for TPU only; CPU tests use lane
    try:
        from drake_ddp_tpu.ops.megaroll import pallas_rollout_for_system

        fused = pallas_rollout_for_system(system, num_steps,
                                          block_b=block_b)
        if fused is None:
            return None
        key = (id(system), num_steps, block_b)
        if (rollout_kernel == "auto" and key not in _PREFLIGHT_OK
                and jax.default_backend() in ("tpu", "axon")):
            n, m, T = system.n, system.m, num_steps - 1
            s = lambda *sh: jax.ShapeDtypeStruct(sh, jnp.float32)
            fused.lower(
                s(n, block_b), s(block_b), s(T, m, block_b),
                s(T, m, block_b), s(T, m, n, block_b), s(T, n, block_b),
            ).compile()
            _PREFLIGHT_OK.add(key)
        return fused
    except Exception as e:
        if rollout_kernel == "fused":
            raise
        KERNEL_SELECTION["fallback_reason"] = (
            f"{type(e).__name__}: {str(e)[:300]}")
        return None


def _vary_like(tree, ref):
    """Promote fresh-constant pytree leaves to the varying manual axes of
    ``ref`` (a data-derived array).

    Under ``shard_map(..., check_vma=True)`` a while_loop carry must have
    the same varying-axis type at init and after the body; the solver's
    zero/inf inits are constants (unvarying) while the body derives new
    values from the (varying) problem data.  Adding a varying zero scalar
    promotes them; outside shard_map (or on unvarying data) this is an
    adds-zero no-op that XLA folds away."""
    vzero = jnp.sum(ref[:0].reshape(-1).astype(jnp.float32))

    def vary(a):
        if a.dtype == jnp.bool_:
            return a | (vzero != 0.0)
        return a + vzero.astype(a.dtype)

    return jax.tree_util.tree_map(vary, tree)


def _to_lane(a):
    """(B, ...) -> (..., B)."""
    return jnp.moveaxis(a, 0, -1)


def _tile_c(a, C):
    """(..., B) -> (..., C*B) with lane index c*B + b."""
    return jnp.tile(a, (1,) * (a.ndim - 1) + (C,))


def _chunk_rollout_lanes(step_T, prob, state, eps_cb,
                         cost_ceiling=float("inf"), fused=None):
    """Closed-loop rollouts for eps_cb (C, B) candidates in one scan (or
    one fused Pallas kernel, see ops/megaroll.py).

    prob/state leaves carry a leading batch axis B.  Returns
    x (C, B, N, n), u (C, B, N-1, m), L (C, B), steps (C, B, N).
    """
    C, B = eps_cb.shape
    N = state.x_bar.shape[1]
    n = state.x_bar.shape[-1]
    m = state.u_bar.shape[-1]
    CB = C * B
    eps_flat = eps_cb.reshape(CB)

    # lane-layout tapes, time-major
    u_bar_T = jnp.moveaxis(state.u_bar, 0, -1)        # (N-1, m, B)
    kappa_T = jnp.moveaxis(state.kappa, 0, -1)
    K_T = jnp.moveaxis(state.K, 0, -1)                # (N-1, m, n, B)
    xb_T = jnp.moveaxis(state.x_bar[:, :-1], 0, -1)   # (N-1, n, B)

    x0 = _tile_c(_to_lane(prob.x0), C)                # (n, CB)

    if fused is not None:
        xs, us = fused(x0, eps_flat, _tile_c(u_bar_T, C),
                       _tile_c(kappa_T, C), _tile_c(K_T, C),
                       _tile_c(xb_T, C))
    else:
        def body(x, inputs):
            ub_t, kap_t, K_t, bx_t = inputs
            dx = x - _tile_c(bx_t, C)                 # (n, CB)
            Kdx = jnp.sum(_tile_c(K_t, C) * dx[None], axis=1)  # (m, CB)
            u = (_tile_c(ub_t, C)
                 - eps_flat[None] * _tile_c(kap_t, C)
                 - Kdx)
            x_next = step_T(x, u)
            return x_next, (x_next, u)

        _, (xs, us) = jax.lax.scan(body, x0, (u_bar_T, kappa_T, K_T, xb_T))
    x_full = jnp.concatenate([x0[None], xs], axis=0)  # (N, n, CB)

    # per-step costs (mirrors ilqr._cost_steps, lane layout)
    xn_T = _tile_c(_to_lane(prob.x_nom), C)           # (n, CB)
    Q_T = _tile_c(_to_lane(prob.Q), C)                # (n, n, CB)
    R_T = _tile_c(_to_lane(prob.R), C)
    Qf_T = _tile_c(_to_lane(prob.Qf), C)
    dxn = x_full - xn_T[None]                         # (N, n, CB)
    Qdx = jnp.einsum("ijB,tjB->tiB", Q_T, dxn[:-1])
    Ru = jnp.einsum("ijB,tjB->tiB", R_T, us)
    running = (jnp.sum(dxn[:-1] * Qdx, axis=1)
               + jnp.sum(us * Ru, axis=1))            # (N-1, CB)
    dxf = dxn[-1]
    terminal = jnp.sum(dxf * jnp.einsum("ijB,jB->iB", Qf_T, dxf), axis=0)
    steps = jnp.concatenate([running, terminal[None]], axis=0)  # (N, CB)
    L = jnp.sum(steps, axis=0)
    L = jnp.where(jnp.isfinite(L) & (L <= cost_ceiling), L, jnp.inf)

    # back to batch-first candidate-major layout
    x_out = jnp.moveaxis(x_full.reshape(N, n, C, B), (2, 3), (0, 1))
    u_out = jnp.moveaxis(us.reshape(N - 1, m, C, B), (2, 3), (0, 1))
    return (x_out, u_out, L.reshape(C, B),
            jnp.moveaxis(steps.reshape(N, C, B), 0, -1))   # (C, B, N)


def _linesearch_batched(step_T, cfg, prob, state, fused=None):
    """Batched mirror of ilqr._linesearch: identical accepted-eps
    semantics; lanes that have accepted freeze their carry (exactly the
    vmap-of-while_loop behavior)."""
    B = state.x_bar.shape[0]
    N = state.x_bar.shape[1]
    dtype = state.x_bar.dtype
    C = max(1, int(cfg.ls_parallel))
    beta = jnp.asarray(cfg.beta, dtype)
    powers = beta ** jnp.arange(C, dtype=dtype)
    chunk_factor = beta ** jnp.asarray(C, dtype)
    dV_sum = jnp.sum(state.dV_coeff, axis=1)              # (B,)
    steps_bar = jax.vmap(_cost_steps)(prob, state.x_bar, state.u_bar)
    have_incumbent = jnp.isfinite(state.L)
    floor = jnp.asarray(cfg.ls_expected_floor, dtype)

    def allowed(eps):
        # mirror of ilqr._linesearch.allowed: candidates whose predicted
        # decrease eps*(1-eps/2)*dV_sum can't reach ls_expected_floor are
        # skipped (per lane); broadcasts (C, B) or (B,) against dV_sum (B,)
        return ~have_incumbent | (
            eps * (1.0 - eps / 2.0) * dV_sum >= floor)

    def chunk(eps_start):
        eps_cb = eps_start[None, :] * powers[:, None]     # (C, B)
        x, u, L, steps = _chunk_rollout_lanes(step_T, prob, state, eps_cb,
                                              cfg.cost_ceiling, fused=fused)
        expected = -eps_cb * (1.0 - eps_cb / 2.0) * dV_sum[None]
        diff = jnp.sum(steps_bar[None] - steps, axis=2)   # (C, B)
        improvement = jnp.where(
            have_incumbent[None], diff,
            jnp.where(jnp.isfinite(L), jnp.inf, -jnp.inf))
        improvement = jnp.where(jnp.isfinite(L), improvement, -jnp.inf)
        accept = (improvement > cfg.gamma * expected) & (
            eps_cb >= cfg.eps_min) & allowed(eps_cb)
        found = jnp.any(accept, axis=0)                   # (B,)
        idx = jnp.argmax(accept, axis=0)                  # (B,) first True
        take = lambda a: jnp.take_along_axis(
            a, idx.reshape((1,) + (B,) + (1,) * (a.ndim - 2)), axis=0)[0]
        eps_sel = jnp.take_along_axis(eps_cb, idx[None], axis=0)[0]
        return (found, idx, eps_sel, take(x), take(u),
                jnp.take_along_axis(L, idx[None], axis=0)[0],
                jnp.take_along_axis(improvement, idx[None], axis=0)[0])

    def cond(carry):
        eps_start, k, found, *_ = carry
        return jnp.any(~found & (eps_start >= cfg.eps_min)
                       & allowed(eps_start))

    def body(carry):
        eps_start, k, found, n_iters, eps, x, u, L, imp = carry
        active = (~found & (eps_start >= cfg.eps_min)
                  & allowed(eps_start))                   # per-lane cond
        (found_c, idx, eps_c, x_c, u_c, L_c, imp_c) = chunk(eps_start)
        n_new = (k * C + idx + 1).astype(jnp.int32)
        sel = lambda new, old: jnp.where(
            active.reshape((B,) + (1,) * (old.ndim - 1)), new, old)
        return (
            sel(eps_start * chunk_factor, eps_start),
            k + 1,
            sel(found | found_c, found),
            sel(n_new, n_iters),
            sel(eps_c, eps),
            sel(x_c, x),
            sel(u_c, u),
            sel(L_c, L),
            sel(imp_c, imp),
        )

    init = _vary_like((
        jnp.ones((B,), dtype),
        jnp.asarray(0, jnp.int32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), dtype),
        state.x_bar,
        state.u_bar,
        jnp.full((B,), jnp.inf, dtype),
        jnp.zeros((B,), dtype),
    ), state.x_bar)
    (eps_start, k, found, n_iters, eps, x, u, L, imp) = jax.lax.while_loop(
        cond, body, init)
    floor_cut = ~found & (eps_start >= cfg.eps_min) & ~allowed(eps_start)
    return eps, x, u, L, imp, n_iters, ~found, floor_cut


def solve_ilqr_batched(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    prob: ILQRProblem,
    rollout_kernel: str = "auto",
    deriv_kernel: str = "auto",
) -> ILQRSolution:
    """Batched mirror of ilqr.solve_ilqr: every ``prob`` leaf carries a
    leading batch axis B; the returned ILQRSolution leaves do too.

    ``rollout_kernel``: 'auto' (Pallas kernel when the system provides a
    lane step, else lane-major XLA), 'pallas', or 'lane'.
    ``deriv_kernel``: 'auto' (Pallas mega-jac kernel on TPU when the
    system provides a structured-IFT lane jac, degrading to the XLA
    lane jac on any kernel-compile failure), 'megajac' (explicit,
    raises on failure), 'lane' (XLA lane-major structured-IFT, see
    multibody/lanejac.py) or 'xla' (vmapped jax.jacfwd through the
    per-scenario step).
    """
    cfg.derivs.validate()
    step = system.bound_step()
    N = cfg.num_steps
    KERNEL_SELECTION["fallback_reason"] = None
    KERNEL_SELECTION["derivs_fallback_reason"] = None
    fused = _fused_rollout_for(system, rollout_kernel, N)
    # when the fused whole-horizon kernel drives the rollout the per-step
    # path is dead code — skip its (expensive) Pallas build
    step_T = _lane_step_for(system, "lane" if fused is not None
                            else rollout_kernel)
    KERNEL_SELECTION["rollout"] = (
        "fused" if fused is not None
        else "megastep" if (system.lane_step_fn is not None
                            and step_T is not system.lane_step_fn)
        else "lane")
    B, n = prob.x0.shape
    m = prob.u_init.shape[-1]
    dtype = prob.x0.dtype

    # root-seeded jac preferred when the system provides one: the
    # trajectory handed to the derivative phase is the accepted rollout,
    # whose x_{t+1} IS the converged contact root — skipping the jac's
    # internal Newton (see lanejac root_seed)
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
    KERNEL_SELECTION["derivs"] = (
        "megajac" if pjac is not None
        else "lane" if jac_T is not None else "xla")
    KERNEL_SELECTION["derivs_root"] = bool(root and jac_T is not None)
    if jac_T is not None:
        derivs_fn = partial(kp.compute_derivatives_batched, jac_T,
                            cfg.derivs, root=root)
    else:
        derivs_fn = jax.vmap(partial(kp.compute_derivatives, step,
                                     cfg.derivs))
    if cfg.parallel_backward:
        from drake_ddp_tpu.solver.parscan import parallel_backward_pass

        bp_one = lambda p, x, u, fx, fu, reg: parallel_backward_pass(
            cfg, p, x, u, fx, fu, reg=reg)
    else:
        bp_one = lambda p, x, u, fx, fu, reg: _backward_pass(
            cfg, p, x, u, fx, fu, reg=reg)
    bp_fn = jax.vmap(bp_one)
    adaptive = cfg.reg > 0.0

    from drake_ddp_tpu.solver.ilqr import _LoopState

    def forward_and_backward(state):
        (eps, x, u, L_new, imp, ls_iters, failed,
         floor_cut) = _linesearch_batched(
            step_T, cfg, prob, state, fused=fused)

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
        # floor_cut = every remaining candidate's predicted decrease is
        # below ls_expected_floor <= delta — convergence, not divergence
        # (mirrors ilqr.solve_ilqr)
        # isfinite(L): no finite incumbent -> not an optimum (see ilqr.py)
        at_optimum = ((jnp.sum(state.dV_coeff, axis=1) <= cfg.delta)
                      | floor_cut) & (state.iteration > 0) & jnp.isfinite(
                          state.L)
        exhausted = jnp.asarray(
            not adaptive) | (state.reg >= cfg.reg_max) | at_optimum
        retry = failed & ~exhausted
        diverged = failed & exhausted & ~at_optimum

        # (vmap of lax.cond executes both branches; compute fresh derivs
        # unconditionally and keep the cache on failed lanes.  The cache
        # is only valid after iteration 0 — before that it is the zeros
        # init, and a first-iteration failure must linearize the kept
        # trajectory (e.g. the policy warm start) or its Levenberg
        # retries run on garbage gains.)
        cache_ok = failed & (state.iteration > 0)
        fx_new, fu_new, pct = derivs_fn(x_use, u_use)
        fx = selb(cache_ok, state.fx, fx_new)
        fu = selb(cache_ok, state.fu, fu_new)
        percent = jnp.where(failed, jnp.zeros_like(pct), pct)
        kappa, K, dV = bp_fn(prob, x_use, u_use, fx, fu, reg_new)

        it = state.iteration
        put = lambda tab, v: tab.at[jnp.arange(B), it].set(v)
        stats = ILQRStats(
            cost=put(state.stats.cost, L_use),
            eps=put(state.stats.eps, jnp.where(failed,
                                               jnp.zeros_like(eps), eps)),
            ls_iters=put(state.stats.ls_iters, ls_iters),
            percent_derivs=put(state.stats.percent_derivs, percent),
        )
        improvement = jnp.where(failed, jnp.asarray(0.0, dtype), imp)

        return _LoopState(
            x_bar=x_use, u_bar=u_use, fx=fx, fu=fu, kappa=kappa, K=K,
            dV_coeff=dV, L=L_use, improvement=improvement,
            iteration=it + 1, reg=reg_new, retry=retry, diverged=diverged,
            stats=stats,
        )

    def lane_cond(state):
        c = (
            ((state.improvement > cfg.delta) | state.retry)
            & (state.iteration < cfg.max_iters)
            & ~state.diverged
        )
        if prob.frozen is not None:
            c = c & ~prob.frozen
        return c

    def cond(state):
        return jnp.any(lane_cond(state))

    def body(state):
        active = lane_cond(state)                          # (B,)
        new = forward_and_backward(state)
        sel = lambda a, b: jnp.where(
            active.reshape((B,) + (1,) * (a.ndim - 1)), a, b) \
            if a.ndim else jnp.where(active, a, b)
        return jax.tree_util.tree_map(sel, new, state)

    stats0 = ILQRStats(
        cost=jnp.zeros((B, cfg.max_iters), dtype),
        eps=jnp.zeros((B, cfg.max_iters), dtype),
        ls_iters=jnp.zeros((B, cfg.max_iters), jnp.int32),
        percent_derivs=jnp.zeros((B, cfg.max_iters), dtype),
    )
    # Policy warm start (see ILQRProblem docstring / ilqr.solve_ilqr)
    warm = prob.K_init is not None
    init = _vary_like(_LoopState(
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

    final = jax.lax.while_loop(cond, body, init)
    return ILQRSolution(
        x=final.x_bar, u=final.u_bar, K=final.K, kappa=final.kappa,
        cost=final.L, iterations=final.iteration, diverged=final.diverged,
        stats=final.stats,
    )
