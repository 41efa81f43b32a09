"""MPC chain-health policy: divergence grace (MPCConfig.freeze_after) and
the garbage-convergence guard (MPCConfig.resolve_cost_ceiling).

A failed resolve must coast on the last-good policy, count toward the
latch, and reset the count on recovery; the latch must only engage after
``freeze_after`` CONSECUTIVE failures.  Pendulum keeps this cheap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_ddp_tpu.mpc.driver import MPCConfig, mpc_solve, mpc_solve_batched
from drake_ddp_tpu.solver.ilqr import ILQRProblem


@pytest.fixture(scope="module")
def pendulum_mpc():
    from drake_ddp_tpu.examples import pendulum as ex

    ilqr = ex.build_solver(ex.Config(verbose=False))
    system, scfg = ilqr.system, ilqr.config
    scfg = scfg._replace(max_iters=20)
    prob = ilqr._problem()
    N = scfg.num_steps
    n, m = prob.x0.shape[-1], prob.u_init.shape[-1]
    prob = prob._replace(
        K_init=jnp.zeros((N - 1, m, n), jnp.float32),
        x_ref_init=jnp.tile(prob.x0[None], (N, 1)).astype(jnp.float32),
    )
    return system, scfg, prob


def test_healthy_chain_never_latches(pendulum_mpc):
    system, scfg, prob = pendulum_mpc
    mpcc = MPCConfig(num_resolves=3, replan_steps=2,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=2)
    res = jax.jit(lambda p: mpc_solve(system, scfg, p, mpcc))(prob)
    assert not np.asarray(res.diverged).any()
    assert not bool(np.asarray(res.dead))
    assert int(np.asarray(res.consec)) == 0
    # costs decrease monotonically on the converging pendulum chain
    costs = np.asarray(res.costs)
    assert np.all(np.isfinite(costs))


def test_forced_failures_latch_after_grace(pendulum_mpc):
    system, scfg, prob = pendulum_mpc
    # resolve_cost_ceiling below any achievable cost: every solve is
    # treated as a failed resolve
    mpcc = MPCConfig(num_resolves=3, replan_steps=2,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=2, resolve_cost_ceiling=1e-9)
    res = jax.jit(lambda p: mpc_solve(system, scfg, p, mpcc))(prob)
    # every resolve flagged: entry (consec=1, below grace), resolve 1
    # (consec=2 -> latch), resolves 2-3 (frozen)
    assert np.asarray(res.diverged).all()
    assert bool(np.asarray(res.dead))
    # the coasted trajectory is the shifted warm start, never garbage
    assert np.isfinite(np.asarray(res.final_x)).all()


def test_grace_one_matches_first_failure_latch(pendulum_mpc):
    system, scfg, prob = pendulum_mpc
    mpcc = MPCConfig(num_resolves=2, replan_steps=2,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=1, resolve_cost_ceiling=1e-9)
    res = jax.jit(lambda p: mpc_solve(system, scfg, p, mpcc))(prob)
    assert np.asarray(res.diverged).all()
    assert bool(np.asarray(res.dead))


def test_batched_latch_and_consec_handoff(pendulum_mpc):
    system, scfg, prob = pendulum_mpc
    B = 3
    tile = lambda a: None if a is None else jnp.tile(
        jnp.asarray(a, jnp.float32)[None], (B,) + (1,) * np.ndim(a))
    pb = ILQRProblem(*[tile(l) for l in prob])
    mpcc = MPCConfig(num_resolves=2, replan_steps=2,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=3, resolve_cost_ceiling=1e-9)
    # consec0=2 for lane 0: its entry-solve failure is its 3rd
    # consecutive -> latches immediately; lanes 1-2 accumulate
    consec0 = jnp.asarray([2, 0, 0], jnp.int32)
    res = jax.jit(lambda p, c: mpc_solve_batched(
        system, scfg, p, mpcc, consec0=c))(pb, consec0)
    dead = np.asarray(res.dead)
    assert dead.tolist() == [True, True, True]
    div = np.asarray(res.diverged)
    assert div.all()
    # lane 0 latched at the entry solve, so its later (frozen) resolves
    # reset the fresh-failure counter; lanes 1-2 hit their 3rd failure
    # on the final resolve, the same one that latched them
    assert np.asarray(res.consec).tolist() == [0, 3, 3]


def test_rescue_seed_recovers_failed_chain(pendulum_mpc):
    """Mini-reproduction of the TPU persistence finding
    (tools/probe_death.py): a chain whose seed tape is garbage keeps
    failing forever under the coast-only policy (every resolve re-coasts
    the same garbage), while the rescue seed recovers it immediately.
    Garbage u=500 with max_iters=3 cannot reach cost<=5; the zeros seed
    converges to ~0.33."""
    system, scfg, prob = pendulum_mpc
    scfg = scfg._replace(max_iters=3)
    N = scfg.num_steps
    m = prob.u_init.shape[-1]
    prob = prob._replace(u_init=jnp.full((N - 1, m), 500.0, jnp.float32))
    rescue = jnp.zeros((N - 1, m), jnp.float32)
    mpcc = MPCConfig(num_resolves=2, replan_steps=2,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=3, resolve_cost_ceiling=5.0)
    run = lambda ru: jax.jit(lambda p, c: mpc_solve(
        system, scfg, p, mpcc, consec0=c, rescue_u=ru))(
        prob, jnp.asarray(1, jnp.int32))
    r_no = run(None)
    assert np.asarray(r_no.diverged).all()          # coast never heals
    r_yes = run(rescue)
    assert not np.asarray(r_yes.diverged).any()     # rescue heals at once
    assert float(np.asarray(r_yes.costs)[-1]) < 5.0
    assert int(np.asarray(r_yes.consec)) == 0


def test_rescue_noop_on_healthy_chain(pendulum_mpc):
    """rescue_u must not perturb a chain that never fails: the rescue
    mask stays empty, so results are bitwise identical."""
    system, scfg, prob = pendulum_mpc
    B = 2
    tile = lambda a: None if a is None else jnp.tile(
        jnp.asarray(a, jnp.float32)[None], (B,) + (1,) * np.ndim(a))
    pb = ILQRProblem(*[tile(l) for l in prob])
    rescue = jnp.zeros(prob.u_init.shape, jnp.float32)
    mpcc = MPCConfig(num_resolves=2, replan_steps=2,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=3)
    c0 = jnp.zeros(B, jnp.int32)
    run = lambda ru: jax.jit(lambda p, c: mpc_solve_batched(
        system, scfg, p, mpcc, consec0=c, rescue_u=ru))(pb, c0)
    r_no, r_yes = run(None), run(rescue)
    assert not np.asarray(r_yes.diverged).any()
    np.testing.assert_array_equal(np.asarray(r_no.costs),
                                  np.asarray(r_yes.costs))
    np.testing.assert_array_equal(np.asarray(r_no.final_x),
                                  np.asarray(r_yes.final_x))


def test_batched_recovery_resets_consec(pendulum_mpc):
    """A chain whose failures are only ever transient must never latch
    with freeze_after=2 even when consec0 starts at 1."""
    system, scfg, prob = pendulum_mpc
    B = 2
    tile = lambda a: None if a is None else jnp.tile(
        jnp.asarray(a, jnp.float32)[None], (B,) + (1,) * np.ndim(a))
    pb = ILQRProblem(*[tile(l) for l in prob])
    mpcc = MPCConfig(num_resolves=3, replan_steps=2,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=2)
    consec0 = jnp.asarray([1, 1], jnp.int32)
    res = jax.jit(lambda p, c: mpc_solve_batched(
        system, scfg, p, mpcc, consec0=c))(pb, consec0)
    # healthy solves reset the carried-in count instead of accumulating
    assert not np.asarray(res.dead).any()
    assert np.asarray(res.consec).tolist() == [0, 0]
