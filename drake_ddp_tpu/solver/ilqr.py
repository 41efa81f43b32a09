"""Functional iLQR core: one jit-compiled program per (system, config).

TPU-native re-design of the reference solver
(``IterativeLinearQuadraticRegulator``, reference ilqr.py:12-733):

- the forward rollout + backtracking linesearch (ilqr.py:274-337) is a
  ``lax.while_loop`` over ``lax.scan`` rollouts,
- dynamics Jacobians (ilqr.py:233-272) are a single batched ``jax.jacfwd``
  over the horizon, optionally keypoint-scheduled (see ``keypoints.py``),
- the Riccati backward pass (ilqr.py:623-667) is a reverse ``lax.scan``
  with the same update equations (optionally Quu-regularized — the
  reference uses a plain matrix inverse with no PD check, ilqr.py:655),
- the outer convergence loop (ilqr.py:692) is a ``lax.while_loop`` with a
  static iteration bound.

Failure semantics differ deliberately: the reference *raises* on
infeasible dynamics or linesearch exhaustion (ilqr.py:315-323, 337).  On
TPU one scenario must not kill a 10k-wide batch, so non-finite costs
reject the linesearch step and exhaustion sets a per-scenario ``diverged``
flag.  The whole solver therefore vmaps: ``jax.vmap(solve_ilqr, ...)``
yields thousands of independent solves per compiled call.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_ddp_tpu.solver import keypoints as kp
from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.utils.linalg import solve_spd


class ILQRConfig(NamedTuple):
    """Static solver configuration (reference ilqr.py:21-54 kwargs).

    Attributes:
        num_steps: horizon length N (states x_0..x_{N-1}, controls
            u_0..u_{N-2}).
        delta: convergence tolerance on cost improvement (ilqr.py:692).
        beta: linesearch backtracking factor in (0,1) (ilqr.py:335).
        gamma: linesearch sufficient-decrease parameter (ilqr.py:331).
        max_iters: static bound on outer iterations (the reference loop is
            unbounded; a bound is required for a compiled while_loop's
            diagnostics buffers).
        eps_min: linesearch failure threshold (ilqr.py:302).
        cost_ceiling: candidate trajectories whose total cost exceeds
            this are rejected exactly like infeasible rollouts (the
            reference's L = inf treatment, ilqr.py:315-323) — a lane
            whose dynamics blew up diverges cleanly instead of dragging
            a batched linesearch through deep backtracking.  inf = off.
        reg: initial Quu Tikhonov regularization added before the gain
            solve.  The reference uses none (ilqr.py:655); stiff contact
            in f32 regularly produces indefinite Quu, so the solver uses
            Levenberg-style *adaptive* regularization: on a failed
            linesearch reg grows by ``reg_mult`` and the backward pass is
            recomputed (a retry, not a divergence) until ``reg_max``; on
            success it decays by ``reg_mult`` down to ``reg``.  Set
            ``reg = 0`` to disable adaptation and reproduce the
            reference's raise-on-failure behavior exactly.
        reg_mult: adaptive regularization growth/decay factor.
        reg_max: divergence is declared only once reg exceeds this.
        parallel_backward: run the Riccati sweep as an O(log N)-depth
            associative scan (solver/parscan.py) instead of the
            sequential reverse scan — wins on long horizons where the
            sweep is latency-bound.
        derivs: keypoint derivative-interpolation config.
        ls_parallel: linesearch candidates evaluated per vectorized
            rollout.  The reference tries one eps at a time (ilqr.py:302);
            on TPU the sequential rollout is latency-bound, so evaluating a
            chunk of the eps schedule {1, beta, beta^2, ...} in one scan
            (an extra leading batch axis) cuts sequential depth by ~this
            factor with identical accepted-eps semantics.  1 reproduces the
            reference's trial-at-a-time schedule.
        ls_expected_floor: skip linesearch candidates whose PREDICTED
            cost decrease eps*(1-eps/2)*sum(dV_coeff) (the reference's
            expected-improvement magnitude, ilqr.py:326) is below this
            floor, and treat a lane that exhausts the schedule this way
            as CONVERGED (at-optimum), not failed.  Rationale: accepting
            such a candidate terminates the outer loop anyway (its
            achievable improvement <= floor <= delta), so the reference
            outcome is preserved while the deep tail of the backtracking
            schedule — measured at 5-7 extra whole-horizon rollout rounds
            per converging lane on the flagship bench, with acceptances
            at eps ~1e-5 that are pure f32 cost noise — is skipped.  Set
            to cfg.delta for that behavior; 0.0 (default) reproduces the
            reference schedule exactly.  Only meaningful when < delta is
            undetectable anyway; keep <= delta.
    """

    num_steps: int
    delta: float = 1e-2
    beta: float = 0.95
    gamma: float = 0.0
    max_iters: int = 100
    eps_min: float = 1e-8
    cost_ceiling: float = float("inf")
    reg: float = 1e-6
    reg_mult: float = 10.0
    reg_max: float = 1e3
    derivs: kp.DerivsInterpolation = kp.BASELINE
    ls_parallel: int = 8
    parallel_backward: bool = False
    ls_expected_floor: float = 0.0


class ILQRProblem(NamedTuple):
    """Dynamic problem data (a pytree — batchable over scenarios).

    Mirrors the reference's Set* API state (ilqr.py:102-159):
        x0:     (n,) initial state
        x_nom:  (n,) target state
        Q:      (n, n) running state cost
        R:      (m, m) running control cost
        Qf:     (n, n) terminal state cost
        u_init: (N-1, m) initial control tape (time-major)

    Optional policy warm start (both None = the reference's open-loop
    tape warm start):
        K_init:     (N-1, m, n) feedback gains applied around x_ref_init
                    during the FIRST forward rollout.
        x_ref_init: (N, n) state reference for the K_init feedback.

    Motivation (TPU round-3 gait dissection, tools/probe_fall.py): in a
    receding-horizon chain, rolling out the shifted control tape OPEN
    LOOP through stiff contact diverges exponentially over the horizon
    tail — warm-start costs oscillated 1.7 -> 1.7e9 between consecutive
    mini-cheetah resolves, and repairing the blow-up consumed most of the
    iteration budget (or exceeded it, sagging the gait until it fell).
    Seeding the first rollout with the previous solve's time-varying LQR
    policy (u = u_tape - K_init (x - x_ref_init)) keeps the incumbent
    bounded.  The executed controls of the accepted solution still match
    the reference semantics - this only changes the INITIAL GUESS, which
    the reference leaves unspecified beyond SetInitialGuess (ilqr.py:148).
    """

    x0: jax.Array
    x_nom: jax.Array
    Q: jax.Array
    R: jax.Array
    Qf: jax.Array
    u_init: jax.Array
    K_init: Optional[jax.Array] = None
    x_ref_init: Optional[jax.Array] = None
    # Optional () / (B,) bool: skip this scenario entirely — the solver
    # exits at iteration 0 with the warm-start trajectory and L = inf.
    # Used by the MPC driver to stop spending iterations on lanes whose
    # chain has already died (MPCConfig.freeze_diverged): a dead lane
    # otherwise re-diverges every resolve, and in a batched while_loop
    # every live lane waits for its max-depth retries.
    frozen: Optional[jax.Array] = None


class ILQRStats(NamedTuple):
    """Per-iteration diagnostics (the reference's printed table,
    ilqr.py:685-704), as fixed-size arrays masked by ``iterations``."""

    cost: jax.Array            # (max_iters,)
    eps: jax.Array             # (max_iters,)
    ls_iters: jax.Array        # (max_iters,) int32
    percent_derivs: jax.Array  # (max_iters,)


class ILQRSolution(NamedTuple):
    """Solver output (reference Solve() return + SaveSolution payload,
    ilqr.py:669-733)."""

    x: jax.Array           # (N, n) optimal state trajectory
    u: jax.Array           # (N-1, m) optimal control tape
    K: jax.Array           # (N-1, m, n) feedback gains
    kappa: jax.Array       # (N-1, m) feedforward terms
    cost: jax.Array        # scalar final cost
    iterations: jax.Array  # int32 outer iterations executed
    diverged: jax.Array    # bool — linesearch exhausted (reference raises)
    stats: ILQRStats


class _LoopState(NamedTuple):
    x_bar: jax.Array
    u_bar: jax.Array
    fx: jax.Array        # (N-1, n, n) cached dynamics Jacobians at x_bar
    fu: jax.Array        # (N-1, n, m)
    kappa: jax.Array
    K: jax.Array
    dV_coeff: jax.Array
    L: jax.Array
    improvement: jax.Array
    iteration: jax.Array
    reg: jax.Array       # current adaptive Quu regularization
    retry: jax.Array     # bool — last linesearch failed, reg was raised
    diverged: jax.Array
    stats: ILQRStats


def _total_cost(prob: ILQRProblem, x: jax.Array, u: jax.Array) -> jax.Array:
    """sum (x-x_nom)'Q(x-x_nom) + u'Ru over t=0..N-2, + terminal
    (reference ilqr.py:325-327)."""
    dx = x[:-1] - prob.x_nom
    running = jnp.einsum("ti,ij,tj->", dx, prob.Q, dx) + jnp.einsum(
        "ti,ij,tj->", u, prob.R, u
    )
    dxf = x[-1] - prob.x_nom
    return running + dxf @ prob.Qf @ dxf


def _cost_steps(prob: ILQRProblem, x: jax.Array, u: jax.Array) -> jax.Array:
    """Per-step costs (N,): running terms for t < N-1, terminal at N-1.
    Linesearch improvements are evaluated as sums of per-step cost
    *differences* — in f32 the difference of two large cost sums loses
    the small improvements that late backtracking steps produce."""
    dx = x[:-1] - prob.x_nom
    running = jnp.einsum("ti,ij,tj->t", dx, prob.Q, dx) + jnp.einsum(
        "ti,ij,tj->t", u, prob.R, u
    )
    dxf = x[-1] - prob.x_nom
    return jnp.concatenate([running, (dxf @ prob.Qf @ dxf)[None]])


def _chunk_rollout(
    step: Callable,
    prob: ILQRProblem,
    state: _LoopState,
    eps_vec: jax.Array,
    cost_ceiling: float = float("inf"),
):
    """Closed-loop rollouts for a whole vector of eps candidates in ONE
    scan over the horizon (candidate axis vectorized).

    Returns x: (C, N, n), u: (C, N-1, m), L: (C,).
    """
    C = eps_vec.shape[0]

    def body(x_t, inputs):
        # x_t: (C, n)
        u_bar_t, x_bar_t, kappa_t, K_t = inputs
        u_t = (
            u_bar_t[None, :]
            - eps_vec[:, None] * kappa_t[None, :]
            - (x_t - x_bar_t[None, :]) @ K_t.T
        )
        x_next = jax.vmap(step)(x_t, u_t)
        return x_next, (x_next, u_t)

    x0 = jnp.broadcast_to(prob.x0, (C,) + prob.x0.shape)
    _, (xs, us) = jax.lax.scan(
        body, x0, (state.u_bar, state.x_bar[:-1], state.kappa, state.K)
    )
    x = jnp.concatenate([x0[None], xs], axis=0)  # (N, C, n)
    x = jnp.moveaxis(x, 1, 0)                    # (C, N, n)
    u = jnp.moveaxis(us, 1, 0)                   # (C, N-1, m)
    steps = jax.vmap(lambda xc, uc: _cost_steps(prob, xc, uc))(x, u)
    L = jnp.sum(steps, axis=1)
    # non-finite OR physically-implausible costs reject the candidate —
    # the reference treats infeasible rollouts as L = inf
    # (ilqr.py:315-323); cost_ceiling extends that to finite blow-ups so
    # a garbage lane diverges instead of dragging the batch through deep
    # backtracking.
    L = jnp.where(jnp.isfinite(L) & (L <= cost_ceiling), L, jnp.inf)
    return x, u, L, steps


def _linesearch(
    step: Callable,
    cfg: ILQRConfig,
    prob: ILQRProblem,
    state: _LoopState,
):
    """Backtracking linesearch on eps (reference ilqr.py:274-337).

    The accepted eps is the first (largest) entry of the schedule
    {1, beta, beta^2, ...} with improvement > gamma * expected — exactly
    the reference's choice — but candidates are evaluated ``ls_parallel``
    at a time in one vectorized rollout (see ILQRConfig.ls_parallel).

    Returns (eps, x, u, L, improvement, n_iters, failed, floor_cut).
    ``failed`` replaces the reference's RuntimeError so a batched solve
    can mask out the scenario; ``floor_cut`` marks a failure caused only
    by the ``ls_expected_floor`` schedule cut (treated as convergence by
    the caller).  ``improvement`` is computed as a sum of per-step cost
    differences vs the incumbent trajectory (see _cost_steps).
    """
    dtype = state.x_bar.dtype
    C = max(1, int(cfg.ls_parallel))
    beta = jnp.asarray(cfg.beta, dtype)
    powers = beta ** jnp.arange(C, dtype=dtype)       # [1, b, ..., b^(C-1)]
    chunk_factor = beta ** jnp.asarray(C, dtype)
    dV_sum = jnp.sum(state.dV_coeff)
    # incumbent per-step costs (first outer iteration: no incumbent yet)
    steps_bar = _cost_steps(prob, state.x_bar, state.u_bar)
    have_incumbent = jnp.isfinite(state.L)
    floor = jnp.asarray(cfg.ls_expected_floor, dtype)

    def allowed(eps):
        # candidate worth trying: predicted decrease reaches the floor
        # (eps*(1-eps/2) is increasing on (0,1], so a chunk whose first
        # candidate is disallowed has no allowed candidates).  The first
        # outer iteration has no incumbent (dV_coeff = 0) and must roll
        # out regardless.  floor = 0 (default) allows everything.
        return ~have_incumbent | (eps * (1.0 - eps / 2.0) * dV_sum >= floor)

    def chunk(eps_start):
        eps_vec = eps_start * powers
        x, u, L, steps = _chunk_rollout(step, prob, state, eps_vec,
                                        cfg.cost_ceiling)
        # expected reduction sum_t -eps (1-eps/2) dV_coeff[t] (ilqr.py:326)
        expected = -eps_vec * (1.0 - eps_vec / 2.0) * dV_sum
        diff = jnp.sum(steps_bar[None, :] - steps, axis=1)
        improvement = jnp.where(
            have_incumbent, diff,
            jnp.where(jnp.isfinite(L), jnp.inf, -jnp.inf))
        improvement = jnp.where(jnp.isfinite(L), improvement, -jnp.inf)
        accept = ((improvement > cfg.gamma * expected)
                  & (eps_vec >= cfg.eps_min) & allowed(eps_vec))
        found = jnp.any(accept)
        idx = jnp.argmax(accept)  # first True = largest acceptable eps
        return (found, idx, eps_vec[idx], x[idx], u[idx], L[idx],
                improvement[idx])

    def cond(carry):
        eps_start, k, found, *_ = carry
        return ~found & (eps_start >= cfg.eps_min) & allowed(eps_start)

    def body(carry):
        eps_start, k, _, _, _eps, x, u, L, imp = carry
        found, idx, eps_sel, x_sel, u_sel, L_sel, imp_sel = chunk(eps_start)
        n_iters = k * C + idx + 1
        return (
            eps_start * chunk_factor,
            k + 1,
            found,
            n_iters.astype(jnp.int32),
            eps_sel,
            x_sel,
            u_sel,
            L_sel,
            imp_sel,
        )

    init = (
        jnp.asarray(1.0, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(1.0, dtype),
        state.x_bar,
        state.u_bar,
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(0.0, dtype),
    )
    (eps_start, k, found, n_iters, eps, x, u, L, imp) = jax.lax.while_loop(
        cond, body, init)
    floor_cut = ~found & (eps_start >= cfg.eps_min) & ~allowed(eps_start)
    return eps, x, u, L, imp, n_iters, ~found, floor_cut


def _backward_pass(cfg: ILQRConfig, prob: ILQRProblem, x_bar, u_bar, fx, fu,
                   reg=None):
    """Riccati sweep (reference ilqr.py:623-667) as a reverse lax.scan.

    Uses the reference's exact update equations (Gauss-Newton iLQR with
    first-order dynamics only), with a linear solve instead of an explicit
    inverse and optional Tikhonov regularization on Quu.

    TPU matmuls default to bf16 passes; over an N-step value recursion
    that compounds to visible gain error and can overflow to NaN on
    stiff problems — pin full f32 inside the sweep (scoped here, not
    solver-wide: an all-f32 program at batch 256 crashes the TPU
    compiler).
    """
    with jax.default_matmul_precision("float32"):
        return _backward_pass_impl(cfg, prob, x_bar, u_bar, fx, fu, reg)


def _backward_pass_impl(cfg, prob, x_bar, u_bar, fx, fu, reg=None):
    n = x_bar.shape[-1]
    m = u_bar.shape[-1]
    x_nom, Q, R, Qf = prob.x_nom, prob.Q, prob.R, prob.Qf
    if reg is None:
        reg = jnp.asarray(cfg.reg, x_bar.dtype)

    Vx0 = 2.0 * Qf @ (x_bar[-1] - x_nom)
    Vxx0 = 2.0 * Qf
    eye_m = jnp.eye(m, dtype=x_bar.dtype)

    def body(carry, inputs):
        Vx, Vxx = carry
        x, u, fx_t, fu_t = inputs
        # Cost partials (reference ilqr.py:161-186).
        lx = 2.0 * Q @ (x - x_nom)
        lu = 2.0 * R @ u
        # Q-function terms (reference ilqr.py:651-656).
        fxT_Vxx = fx_t.T @ Vxx
        Qx = lx + fx_t.T @ Vx
        Qu = lu + fu_t.T @ Vx
        Qxx = 2.0 * Q + fxT_Vxx @ fx_t
        Quu = 2.0 * R + fu_t.T @ Vxx @ fu_t + reg * eye_m
        Qux = fu_t.T @ Vxx @ fx_t
        # Gains via one (m, 1+n) solve (reference ilqr.py:659-660 uses
        # an explicit inverse; solve_spd is a TPU-fusable closed-form /
        # unrolled-Cholesky solve — LU custom calls cost ~1.5 ms each
        # inside a scan).
        rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
        sol = solve_spd(Quu, rhs)
        kappa_t = sol[:, 0]
        K_t = sol[:, 1:]
        dV_t = Qu @ kappa_t  # Qu' Quu^-1 Qu (ilqr.py:663)
        # Value update (reference ilqr.py:666-667).  Symmetrize Vxx every
        # step: in f32 the asymmetry drift over a long horizon visibly
        # degrades the gains (the reference runs in f64 and skips this).
        Vx_new = Qx - Qux.T @ kappa_t
        Vxx_new = Qxx - Qux.T @ K_t
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        return (Vx_new, Vxx_new), (kappa_t, K_t, dV_t)

    (_, _), (kappa, K, dV) = jax.lax.scan(
        body,
        (Vx0, Vxx0),
        (x_bar[:-1], u_bar, fx, fu),
        reverse=True,
    )
    return kappa, K, dV


def solve_ilqr(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    prob: ILQRProblem,
) -> ILQRSolution:
    """Run the full iLQR outer loop (reference Solve(), ilqr.py:669-710).

    Pure function of (system.params, prob); jit/vmap over ``prob`` (and
    ``system.params``) for scenario batching.  Compile once per
    (step_fn, cfg) pair.
    """
    cfg.derivs.validate()
    step = system.bound_step()
    N = cfg.num_steps
    n, m = prob.x0.shape[-1], prob.u_init.shape[-1]
    dtype = prob.x0.dtype

    derivs_fn = partial(kp.compute_derivatives, step, cfg.derivs)

    adaptive = cfg.reg > 0.0

    def forward_and_backward(state: _LoopState) -> _LoopState:
        # Forward pass: linesearch + derivative computation
        # (reference ilqr.py:339-378).
        eps, x, u, L_new, imp, ls_iters, failed, floor_cut = _linesearch(
            step, cfg, prob, state)

        # On linesearch failure keep the previous iterate (the reference
        # raises RuntimeError, ilqr.py:337; a batched solve must not).
        sel = lambda a, b: jnp.where(failed, b, a)
        x_use = sel(x, state.x_bar)
        u_use = sel(u, state.u_bar)
        L_use = sel(L_new, state.L)

        # Levenberg-style adaptive regularization: raise on failure and
        # retry, decay toward cfg.reg on success.
        if adaptive:
            reg_new = jnp.where(
                failed,
                state.reg * cfg.reg_mult,
                jnp.maximum(state.reg / cfg.reg_mult, cfg.reg),
            )
        else:
            reg_new = state.reg
        # If the expected improvement is already below delta the iterate
        # is at a local optimum — report convergence, not divergence.
        # (Gated on iteration > 0: the init dV_coeff of zeros is not a
        # converged state.)  A floor_cut linesearch exit means every
        # remaining candidate's predicted decrease was below
        # ls_expected_floor <= delta — also convergence (see ILQRConfig).
        # isfinite(L): a lane with no finite incumbent (every rollout so
        # far NaN'd/blew up) is NOT at an optimum — without this guard it
        # can exit "converged" on its zeros-init x_bar and silently poison
        # an MPC chain's handoff state.
        at_optimum = ((jnp.sum(state.dV_coeff) <= cfg.delta) | floor_cut) & (
            state.iteration > 0) & jnp.isfinite(state.L)
        exhausted = jnp.asarray(
            not adaptive) | (state.reg >= cfg.reg_max) | at_optimum
        retry = failed & ~exhausted
        diverged = failed & exhausted & ~at_optimum

        # Dynamics Jacobians are a function of the trajectory alone; on a
        # reg-retry the trajectory is unchanged, so reuse the cached stack
        # and only redo the (cheap) backward pass.  lax.cond keeps the
        # expensive branch unexecuted on retries.  The cache is only
        # valid after iteration 0 (before that it is the zeros init, and
        # a first-iteration failure must linearize the kept trajectory —
        # e.g. the policy warm start — or its Levenberg retries run on
        # garbage gains).
        def fresh_derivs(_):
            fx_new, fu_new, pct = derivs_fn(x_use, u_use)
            return fx_new, fu_new, pct

        def cached_derivs(_):
            return state.fx, state.fu, jnp.asarray(0.0, dtype)

        fx, fu, percent = jax.lax.cond(
            failed & (state.iteration > 0), cached_derivs, fresh_derivs,
            operand=None)
        percent = jnp.where(failed, jnp.asarray(0.0, dtype), percent)
        if cfg.parallel_backward:
            from drake_ddp_tpu.solver.parscan import parallel_backward_pass
            kappa, K, dV = parallel_backward_pass(
                cfg, prob, x_use, u_use, fx, fu, reg=reg_new)
        else:
            kappa, K, dV = _backward_pass(cfg, prob, x_use, u_use, fx, fu,
                                          reg=reg_new)

        it = state.iteration
        stats = ILQRStats(
            cost=state.stats.cost.at[it].set(L_use),
            eps=state.stats.eps.at[it].set(sel(eps, jnp.zeros_like(eps))),
            ls_iters=state.stats.ls_iters.at[it].set(ls_iters),
            percent_derivs=state.stats.percent_derivs.at[it].set(percent),
        )
        improvement = jnp.where(failed, jnp.asarray(0.0, dtype), imp)

        return _LoopState(
            x_bar=x_use,
            u_bar=u_use,
            fx=fx,
            fu=fu,
            kappa=kappa,
            K=K,
            dV_coeff=dV,
            L=L_use,
            improvement=improvement,
            iteration=it + 1,
            reg=reg_new,
            retry=retry,
            diverged=diverged,
            stats=stats,
        )

    def cond(state: _LoopState):
        c = (
            ((state.improvement > cfg.delta) | state.retry)
            & (state.iteration < cfg.max_iters)
            & ~state.diverged
        )
        if prob.frozen is not None:
            c = c & ~prob.frozen
        return c

    stats0 = ILQRStats(
        cost=jnp.zeros(cfg.max_iters, dtype),
        eps=jnp.zeros(cfg.max_iters, dtype),
        ls_iters=jnp.zeros(cfg.max_iters, jnp.int32),
        percent_derivs=jnp.zeros(cfg.max_iters, dtype),
    )
    # Policy warm start (see ILQRProblem): with K_init/x_ref_init the
    # FIRST linesearch rollout is closed-loop around the previous
    # solution instead of an open-loop tape replay (kappa starts at 0,
    # so every eps candidate coincides — the largest finite one accepts).
    warm = prob.K_init is not None
    init = _LoopState(
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

    final = jax.lax.while_loop(cond, forward_and_backward, init)
    return ILQRSolution(
        x=final.x_bar,
        u=final.u_bar,
        K=final.K,
        kappa=final.kappa,
        cost=final.L,
        iterations=final.iteration,
        diverged=final.diverged,
        stats=final.stats,
    )
