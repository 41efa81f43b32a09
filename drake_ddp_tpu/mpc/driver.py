"""Receding-horizon MPC driver.

Re-implements the reference's resolve loop (acrobot.py:131-162,
mini_cheetah.py:180-213) as a single compiled ``lax.scan`` over resolves,
so a whole batched MPC run (thousands of scenarios x N resolves) is one
XLA program:

- warm start: keep the tail of the last optimal control tape and repeat
  the final input for the new steps (mini_cheetah.py:193-197),
- open-loop handoff: the next initial state is the predicted state
  ``replan_steps`` into the last solution (mini_cheetah.py:198),
- optional moving target: x_nom advances by target_vel * dt *
  replan_steps each resolve (mini_cheetah.py:152-156).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, solve_ilqr


class MPCConfig(NamedTuple):
    num_resolves: int      # additional solves after the initial one
    replan_steps: int      # horizon shift per resolve (>0)
    # Seed every resolve with the previous solution's time-varying LQR
    # policy (shifted K + state reference) in addition to the shifted
    # control tape.  The reference warm-starts with the tape alone
    # (mini_cheetah.py:193-197), but replaying a tape OPEN LOOP through
    # stiff contact diverges exponentially over the horizon tail (gait
    # dissection: warm-start costs oscillating 1.7 -> 1.7e9 between
    # resolves, tools/probe_fall.py); the closed-loop seed keeps the
    # incumbent bounded.  False = reference behavior.
    policy_warm_start: bool = False
    # Latch divergence: once a lane's resolve diverges ``freeze_after``
    # times IN A ROW, freeze it for the rest of the chain (its solves
    # exit at iteration 0 and it coasts on the last-good policy).  A
    # dead lane otherwise re-diverges every resolve, and in a batched
    # while_loop every live lane waits through its max-depth Levenberg
    # retries.  The lane stays flagged diverged in MPCResult for every
    # remaining resolve.  False = keep retrying forever.
    freeze_diverged: bool = False
    # Consecutive failed resolves before the latch.  1 = latch on the
    # first failure.  TPU round-4 dissection (tools/probe_death.py,
    # batch 256 x 72 resolves): failures are PERSISTENT but not
    # physical — p(fail | prev fail) = 0.9986 while only 0.8% of lanes
    # actually fell (99.2% upright at chain end).  A failed lane's
    # coasted seed (the shifted stale tape whose prediction tail blew
    # up) is handed to every later resolve, so without intervention it
    # never finds a finite incumbent again.  The grace window is what
    # gives the rescue seed (``rescue_u`` in the drivers) its attempts:
    # fail -> rescue tries while consec < freeze_after -> latch only if
    # even the rescue seed cannot recover the lane.
    freeze_after: int = 1
    # A resolve that CONVERGES to a cost above this is treated exactly
    # like a diverged one (coast on the last-good policy, count toward
    # the latch): through stiff contact a solve can "converge" in 2-4
    # iterations to a garbage optimum (blown-up prediction tail whose
    # quadratic model is degenerate), and accepting its trajectory
    # poisons every later warm start.  Healthy flagship resolves cost
    # ~1-50; inf = off.
    resolve_cost_ceiling: float = float("inf")


class MPCResult(NamedTuple):
    states: jax.Array      # (num_steps + resolves*replan, n) stitched traj
    costs: jax.Array       # (num_resolves + 1,) optimal cost per solve
    iterations: jax.Array  # (num_resolves + 1,) iLQR iterations per solve
    diverged: jax.Array    # (num_resolves + 1,) divergence flags
    final_x: jax.Array     # (N, n) last solution
    final_u: jax.Array     # (N-1, m) last control tape
    final_K: Optional[jax.Array] = None  # (N-1, m, n) last feedback gains
    # chain-health latch state (thread across chunked bench calls via
    # ILQRProblem.frozen / the drivers' ``consec0``):
    dead: Optional[jax.Array] = None     # () / (B,) latched-dead flag
    consec: Optional[jax.Array] = None   # () / (B,) consecutive failures


def shift_warm_start(u: jax.Array, replan_steps: int) -> jax.Array:
    """u (N-1, m): drop the first replan_steps inputs, repeat the last
    (mini_cheetah.py:193-197)."""
    tail = u[replan_steps:]
    pad = jnp.tile(u[-1:], (replan_steps, 1))
    return jnp.concatenate([tail, pad], axis=0)


def _shift_tape(a: jax.Array, replan_steps: int, time_axis: int = 0):
    """Shift any time-major tape: drop the first replan_steps entries
    along ``time_axis``, repeat the last entry to keep the length."""
    idx = (slice(None),) * time_axis
    tail = a[idx + (slice(replan_steps, None),)]
    last = a[idx + (slice(-1, None),)]
    reps = [1] * a.ndim
    reps[time_axis] = replan_steps
    return jnp.concatenate([tail, jnp.tile(last, reps)], axis=time_axis)


def mpc_solve(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    prob: ILQRProblem,
    mpc: MPCConfig,
    x_nom_shift: Optional[jax.Array] = None,
    consec0: Optional[jax.Array] = None,
    rescue_u: Optional[jax.Array] = None,
) -> MPCResult:
    """Initial solve + ``mpc.num_resolves`` receding-horizon resolves.

    ``x_nom_shift``: optional (n,) target-state advance applied once per
    resolve (the mini-cheetah moving target: velocity * dt * replan).
    ``consec0``: optional () consecutive-failure count carried in from a
    previous chunked call (see MPCResult.consec).
    ``rescue_u``: optional (N-1, m) safe default control tape (e.g. the
    chain entry's standing-torque init).  A lane whose PREVIOUS resolve
    failed is re-seeded with this open-loop tape (zero feedback gains)
    instead of its coasted stale policy: probe_death.py measured that a
    failed lane's coasted seed keeps a blown-up prediction tail forever
    (p(fail | prev fail) = 0.9986 with the robot still standing), while
    a fresh default-seeded solve from the same handoff state recovers
    (tools/probe_rescue.py).  None = coast forever (probe behavior).
    Pure function — vmap over problems for batched scenario MPC.
    """
    N, rs = cfg.num_steps, mpc.replan_steps
    if mpc.freeze_diverged and not mpc.policy_warm_start:
        raise ValueError(
            "freeze_diverged requires policy_warm_start: a frozen lane's "
            "solve returns its warm-start trajectory, which without the "
            "policy seed is the zeros init")
    dead_prior = (prob.frozen if prob.frozen is not None
                  else jnp.asarray(False))
    if rescue_u is not None and consec0 is None:
        # callers that pass rescue_u without threading a consec count
        # still get in-loop rescues; make the entry branch an explicit
        # no-op instead of silently skipping it
        consec0 = jnp.zeros(jnp.shape(dead_prior), jnp.int32)
    prob0 = prob
    if rescue_u is not None:
        # the previous chunk's last resolve failed: re-seed the entry
        # solve with the safe default tape (open loop) for that lane
        resc0 = (consec0 >= 1) & ~dead_prior
        prob0 = prob0._replace(
            u_init=jnp.where(resc0, rescue_u, prob.u_init))
        if mpc.policy_warm_start and prob.K_init is not None:
            prob0 = prob0._replace(
                K_init=jnp.where(resc0, jnp.zeros_like(prob.K_init),
                                 prob.K_init))
    sol0 = solve_ilqr(system, cfg, prob0)
    # a resolve is "bad" if the solver diverged OR it converged to a
    # garbage optimum (see MPCConfig.resolve_cost_ceiling); dead lanes
    # are excluded (their iteration-0 exit carries L = inf by design)
    bad0 = (sol0.diverged
            | ~(sol0.cost <= mpc.resolve_cost_ceiling)) & ~dead_prior
    div0 = bad0 | dead_prior
    x0c, u0c, K0c = sol0.x, sol0.u, sol0.K
    if mpc.policy_warm_start and prob.K_init is not None:
        # the chain's entry solve may also fail: coast on the policy
        # it was seeded with (e.g. the previous bench chunk's handoff)
        sel0 = lambda a, b: jnp.where(div0, a, b)
        x0c = sel0(prob.x_ref_init, sol0.x)
        u0c = sel0(prob.u_init, sol0.u)
        K0c = sel0(prob.K_init, sol0.K)

    consec = (consec0 if consec0 is not None
              else jnp.zeros(jnp.shape(bad0), jnp.int32))
    consec = jnp.where(bad0, consec + 1, jnp.zeros_like(consec))
    dead0 = dead_prior
    if mpc.freeze_diverged:
        dead0 = dead0 | (consec >= mpc.freeze_after)

    def resolve(carry, _):
        x_prev, u_prev, K_prev, x_nom, dead, consec = carry
        u_guess = shift_warm_start(u_prev, rs)
        x0 = x_prev[rs]
        x_nom_new = x_nom if x_nom_shift is None else x_nom + x_nom_shift
        # rescue: the previous resolve failed -> the coasted seed tape is
        # stale garbage; seed THIS solve with the safe default instead
        # (the coast tapes u_guess/K_guess/x_guess still back the
        # trajectory handoff if this solve fails too).  x_ref_init stays
        # the coasted x_guess on purpose: with K_seed = 0 the reference
        # never enters the first rollout (u = rescue_u open loop), and
        # the solver enters with L = inf, so that rollout REPLACES the
        # incumbent unless it is non-finite — the stale reference can
        # only reach a Levenberg linearization when the lane state is
        # already garbage, where no reference is meaningful.
        resc = ((consec >= 1) & ~dead) if rescue_u is not None else None
        u_seed = (u_guess if resc is None
                  else jnp.where(resc, rescue_u, u_guess))
        p = prob._replace(x0=x0, x_nom=x_nom_new, u_init=u_seed)
        if mpc.freeze_diverged:
            p = p._replace(frozen=dead)
        if mpc.policy_warm_start:
            K_guess = _shift_tape(K_prev, rs)
            x_guess = _shift_tape(x_prev, rs)
            K_seed = (K_guess if resc is None
                      else jnp.where(resc, jnp.zeros_like(K_guess),
                                     K_guess))
            p = p._replace(K_init=K_seed, x_ref_init=x_guess)
        sol = solve_ilqr(system, cfg, p)
        bad = (sol.diverged
               | ~(sol.cost <= mpc.resolve_cost_ceiling)) & ~dead
        div = bad | dead
        x_new, u_new, K_new = sol.x, sol.u, sol.K
        if mpc.policy_warm_start:
            # a failed solve's trajectory/gains are garbage (its
            # backward passes ran on a blown-up or zeros-derivative
            # iterate); coast on the shifted last-good policy instead so
            # one bad resolve cannot poison the rest of the chain
            selt = lambda a, b: jnp.where(div, a, b)
            x_new = selt(x_guess, sol.x)
            u_new = selt(u_guess, sol.u)
            K_new = selt(K_guess, sol.K)
        consec_new = jnp.where(bad, consec + 1, jnp.zeros_like(consec))
        dead_new = dead
        if mpc.freeze_diverged:
            dead_new = dead_new | (consec_new >= mpc.freeze_after)
        return (x_new, u_new, K_new, x_nom_new, dead_new, consec_new), (
            x_new, sol.cost, sol.iterations, div)

    ((x_last, u_last, K_last, _, dead_f, consec_f),
     (xs, costs, iters, divs)) = jax.lax.scan(
        resolve,
        (x0c, u0c, K0c, prob.x_nom, dead0, consec),
        None,
        length=mpc.num_resolves,
    )

    # Stitch the playback trajectory exactly as the reference does
    # (mini_cheetah.py:187, 204-206): the initial solution occupies
    # [0, N); each resolve i writes its full horizon at offset (i+1)*rs.
    total = N + rs * mpc.num_resolves
    n = prob.x0.shape[-1]
    states = jnp.zeros((total, n), sol0.x.dtype)
    states = jax.lax.dynamic_update_slice(states, sol0.x, (0, 0))

    def write(i, st):
        return jax.lax.dynamic_update_slice(st, xs[i], ((i + 1) * rs, 0))

    states = jax.lax.fori_loop(0, mpc.num_resolves, write, states)

    return MPCResult(
        states=states,
        costs=jnp.concatenate([sol0.cost[None], costs]),
        iterations=jnp.concatenate([sol0.iterations[None], iters]),
        diverged=jnp.concatenate([div0[None], divs]),
        final_x=x_last,
        final_u=u_last,
        final_K=K_last,
        dead=dead_f,
        consec=consec_f,
    )


def shift_warm_start_batched(u: jax.Array, replan_steps: int) -> jax.Array:
    """Batched shift: u (B, N-1, m)."""
    tail = u[:, replan_steps:]
    pad = jnp.tile(u[:, -1:], (1, replan_steps, 1))
    return jnp.concatenate([tail, pad], axis=1)


def mpc_solve_batched(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    prob: ILQRProblem,
    mpc: MPCConfig,
    x_nom_shift: Optional[jax.Array] = None,
    rollout_kernel: str = "auto",
    deriv_kernel: str = "auto",
    consec0: Optional[jax.Array] = None,
    rescue_u: Optional[jax.Array] = None,
) -> MPCResult:
    """Batched mirror of :func:`mpc_solve` built on
    solver/batched.solve_ilqr_batched: ``prob`` leaves carry a leading
    batch axis B and the MPCResult leaves do too.  The linesearch
    rollouts run through the lane-major / Pallas step (see
    solver/batched.py) instead of a vmapped per-scenario scan.
    ``rescue_u`` ((N-1, m) or (B, N-1, m)): per-lane failed-resolve
    re-seeding, see :func:`mpc_solve`."""
    from drake_ddp_tpu.solver.batched import solve_ilqr_batched

    N, rs = cfg.num_steps, mpc.replan_steps
    if mpc.freeze_diverged and not mpc.policy_warm_start:
        raise ValueError(
            "freeze_diverged requires policy_warm_start: a frozen lane's "
            "solve returns its warm-start trajectory, which without the "
            "policy seed is the zeros init")
    solve = lambda p: solve_ilqr_batched(system, cfg, p,
                                         rollout_kernel=rollout_kernel,
                                         deriv_kernel=deriv_kernel)
    B = prob.x0.shape[0]
    dead_prior = (prob.frozen if prob.frozen is not None
                  else jnp.zeros((B,), bool))
    rescue_ub = (None if rescue_u is None else
                 jnp.broadcast_to(rescue_u, prob.u_init.shape))
    if rescue_ub is not None and consec0 is None:
        # see mpc_solve: entry rescue must not silently disappear when
        # the caller doesn't thread a consec count
        consec0 = jnp.zeros((B,), jnp.int32)
    sel_lane = lambda m, a, b: jnp.where(
        m.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
    prob0 = prob
    if rescue_ub is not None:
        # previous chunk's last resolve failed: entry solve gets the
        # safe default seed for that lane (see mpc_solve)
        resc0 = (consec0 >= 1) & ~dead_prior
        prob0 = prob0._replace(
            u_init=sel_lane(resc0, rescue_ub, prob.u_init))
        if mpc.policy_warm_start and prob.K_init is not None:
            prob0 = prob0._replace(
                K_init=sel_lane(resc0, jnp.zeros_like(prob.K_init),
                                prob.K_init))
    sol0 = solve(prob0)
    bad0 = (sol0.diverged
            | ~(sol0.cost <= mpc.resolve_cost_ceiling)) & ~dead_prior
    div0 = bad0 | dead_prior
    x0c, u0c, K0c = sol0.x, sol0.u, sol0.K
    if mpc.policy_warm_start and prob.K_init is not None:
        # coast a failed entry solve on its seed policy (see mpc_solve)
        sel0 = lambda a, b: jnp.where(
            div0.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
        x0c = sel0(prob.x_ref_init, sol0.x)
        u0c = sel0(prob.u_init, sol0.u)
        K0c = sel0(prob.K_init, sol0.K)
    consec = (consec0 if consec0 is not None
              else jnp.zeros(sol0.diverged.shape, jnp.int32))
    consec = jnp.where(bad0, consec + 1, jnp.zeros_like(consec))
    dead0 = dead_prior
    if mpc.freeze_diverged:
        dead0 = dead0 | (consec >= mpc.freeze_after)

    def resolve(carry, _):
        x_prev, u_prev, K_prev, x_nom, dead, consec = carry
        u_guess = shift_warm_start_batched(u_prev, rs)
        x0 = x_prev[:, rs]
        x_nom_new = x_nom if x_nom_shift is None else x_nom + x_nom_shift
        # rescue failed lanes with the safe default seed (see mpc_solve);
        # the coast tapes still back the handoff if this solve fails too.
        # x_ref_init stays the coasted x_guess: see the mpc_solve resolve
        # comment (K_seed = 0 + L = inf entry make it unreachable except
        # from an already-garbage lane state).
        resc = ((consec >= 1) & ~dead) if rescue_ub is not None else None
        u_seed = (u_guess if resc is None
                  else sel_lane(resc, rescue_ub, u_guess))
        p = prob._replace(x0=x0, x_nom=x_nom_new, u_init=u_seed)
        if mpc.freeze_diverged:
            p = p._replace(frozen=dead)
        if mpc.policy_warm_start:
            K_guess = _shift_tape(K_prev, rs, time_axis=1)
            x_guess = _shift_tape(x_prev, rs, time_axis=1)
            K_seed = (K_guess if resc is None
                      else sel_lane(resc, jnp.zeros_like(K_guess),
                                    K_guess))
            p = p._replace(K_init=K_seed, x_ref_init=x_guess)
        sol = solve(p)
        bad = (sol.diverged
               | ~(sol.cost <= mpc.resolve_cost_ceiling)) & ~dead
        div = bad | dead
        x_new, u_new, K_new = sol.x, sol.u, sol.K
        if mpc.policy_warm_start:
            # coast failed lanes on the shifted last-good policy (see
            # the unbatched resolve above)
            selt = lambda a, b: jnp.where(
                div.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
            x_new = selt(x_guess, sol.x)
            u_new = selt(u_guess, sol.u)
            K_new = selt(K_guess, sol.K)
        consec_new = jnp.where(bad, consec + 1, jnp.zeros_like(consec))
        dead_new = dead
        if mpc.freeze_diverged:
            dead_new = dead_new | (consec_new >= mpc.freeze_after)
        return (x_new, u_new, K_new, x_nom_new, dead_new, consec_new), (
            x_new, sol.cost, sol.iterations, div)

    ((x_last, u_last, K_last, _, dead_f, consec_f),
     (xs, costs, iters, divs)) = jax.lax.scan(
        resolve,
        (x0c, u0c, K0c, prob.x_nom, dead0, consec),
        None,
        length=mpc.num_resolves,
    )

    total = N + rs * mpc.num_resolves
    B, n = prob.x0.shape
    states = jnp.zeros((B, total, n), sol0.x.dtype)
    states = jax.lax.dynamic_update_slice(states, sol0.x, (0, 0, 0))

    def write(i, st):
        return jax.lax.dynamic_update_slice(st, xs[i], (0, (i + 1) * rs, 0))

    states = jax.lax.fori_loop(0, mpc.num_resolves, write, states)

    cat = lambda first, rest: jnp.concatenate(
        [first[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)
    return MPCResult(
        states=states,
        costs=cat(sol0.cost, costs),
        iterations=cat(sol0.iterations, iters),
        diverged=cat(div0, divs),
        final_x=x_last,
        final_u=u_last,
        final_K=K_last,
        dead=dead_f,
        consec=consec_f,
    )
