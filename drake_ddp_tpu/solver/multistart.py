"""Batched multi-start iLQR: the TPU answer to contact multi-modality.

Contact-implicit problems are severely multi-modal (the cart-pole wall
task's local optima span costs 25..1100 depending on the initial control
tape).  The reference hints at randomized guesses (commented-out seeded
guess, cart_pole_with_wall.py:157-158) but solves once; on TPU a batch
of perturbed starts costs one vmapped solve, so multi-start is the
natural default for contact tasks."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRProblem,
    ILQRSolution,
    solve_ilqr,
)


class MultistartResult(NamedTuple):
    best: ILQRSolution      # the selected (lowest finite cost) solution
    best_index: jax.Array   # int32
    costs: jax.Array        # (num_starts,) all final costs


def multistart_ilqr(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    prob: ILQRProblem,
    num_starts: int,
    key: jax.Array,
    guess_scale: float = 1.0,
    include_given: bool = True,
) -> MultistartResult:
    """Solve from ``num_starts`` perturbed initial control tapes and keep
    the best.

    Start 0 is the problem's own ``u_init`` when ``include_given``; the
    rest add N(0, guess_scale^2) noise to it.  Diverged starts are
    excluded from selection.  Pure function — nest under vmap/shard_map
    for scenarios x starts.
    """
    K = int(num_starts)
    noise = guess_scale * jax.random.normal(
        key, (K,) + prob.u_init.shape, prob.u_init.dtype)
    if include_given:
        noise = noise.at[0].set(0.0)
    u_inits = prob.u_init[None] + noise

    probs = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (K,) + x.shape), prob)
    probs = probs._replace(u_init=u_inits)

    sols = jax.vmap(lambda p: solve_ilqr(system, cfg, p))(probs)
    score = jnp.where(sols.diverged | ~jnp.isfinite(sols.cost),
                      jnp.inf, sols.cost)
    best = jnp.argmin(score)
    best_sol = jax.tree_util.tree_map(lambda x: x[best], sols)
    return MultistartResult(best=best_sol, best_index=best.astype(jnp.int32),
                            costs=sols.cost)
