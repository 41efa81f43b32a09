"""Receding-horizon gait stability regression (the flagship behavior).

A 10-resolve mini-cheetah walking chain must keep the base upright and
advance toward the moving target.  This is the guard for the
contact_iters=4 fix: at 2 Newton iterations stiff foot impacts inject
energy and the chain falls (base height -> 0, costs -> 1e20) within
~10 resolves."""

import numpy as np
import jax
import jax.numpy as jnp

from drake_ddp_tpu.examples import mini_cheetah as mc
from drake_ddp_tpu.mpc.driver import MPCConfig, mpc_solve_batched
from drake_ddp_tpu.solver import keypoints as kp
from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem


def test_cheetah_walking_chain_stays_upright():
    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    N = int(cfg.T / cfg.dt)
    Q, R, Qf = mc.costs(cfg)
    x0, x_nom = mc.initial_and_target(cfg)
    rs = cfg.replan_steps
    derivs = kp.DerivsInterpolation("setInterval", minN=8,
                                    max_keypoints=8, jac_chunk=8)
    scfg = ILQRConfig(num_steps=N, delta=cfg.delta, beta=cfg.beta,
                      max_iters=12, derivs=derivs, ls_parallel=4)
    mpcc = MPCConfig(num_resolves=10, replan_steps=rs)
    shift = jnp.zeros(37, jnp.float32).at[4].set(
        cfg.target_vel * cfg.dt * rs)
    one = lambda a: jnp.asarray(a, jnp.float32)[None]
    probs = ILQRProblem(
        x0=one(np.asarray(x0)), x_nom=one(np.asarray(x_nom)),
        Q=one(cfg.dt * Q), R=one(cfg.dt * R), Qf=one(Qf),
        u_init=one(np.tile(np.asarray(mc.U_STAND, np.float32),
                           (N - 1, 1))))

    res = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc,
                                              shift))(probs)
    st = np.asarray(res.states)[0]
    costs = np.asarray(res.costs)[0]
    heights = st[:, 6]
    assert np.all(np.isfinite(st))
    # upright throughout (standing height 0.29)
    assert heights.min() > 0.15, heights.min()
    assert heights.max() < 0.5, heights.max()
    # makes forward progress toward the 1 m/s moving target
    assert st[-1, 4] > 0.1, st[-1, 4]
    # costs stay physical (a fallen/exploded chain reaches 1e6+)
    assert costs.max() < 1e4, costs.max()


def test_cheetah_walking_chain_policy_warm_start():
    """The bench path: policy warm start + expected-improvement floor +
    cost ceiling.  Same uprightness pins as the reference-style chain,
    plus the warm start's point — per-resolve iteration counts stay low
    and even (the open-loop tape replay needed iteration spikes to 12 to
    repair exploded warm rollouts; the closed-loop seed keeps the
    incumbent bounded — tools/probe_fall.py dissection)."""
    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    N = int(cfg.T / cfg.dt)
    Q, R, Qf = mc.costs(cfg)
    x0, x_nom = mc.initial_and_target(cfg)
    rs = cfg.replan_steps
    derivs = kp.DerivsInterpolation("setInterval", minN=8,
                                    max_keypoints=8, jac_chunk=8)
    scfg = ILQRConfig(num_steps=N, delta=cfg.delta, beta=cfg.beta,
                      max_iters=12, derivs=derivs, ls_parallel=4,
                      ls_expected_floor=cfg.delta, cost_ceiling=1e4)
    mpcc = MPCConfig(num_resolves=10, replan_steps=rs,
                     policy_warm_start=True)
    shift = jnp.zeros(37, jnp.float32).at[4].set(
        cfg.target_vel * cfg.dt * rs)
    one = lambda a: jnp.asarray(a, jnp.float32)[None]
    probs = ILQRProblem(
        x0=one(np.asarray(x0)), x_nom=one(np.asarray(x_nom)),
        Q=one(cfg.dt * Q), R=one(cfg.dt * R), Qf=one(Qf),
        u_init=one(np.tile(np.asarray(mc.U_STAND, np.float32),
                           (N - 1, 1))))

    res = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc,
                                              shift))(probs)
    st = np.asarray(res.states)[0]
    costs = np.asarray(res.costs)[0]
    iters = np.asarray(res.iterations)[0]
    heights = st[:, 6]
    assert np.all(np.isfinite(st))
    assert heights.min() > 0.15, heights.min()
    assert heights.max() < 0.5, heights.max()
    assert st[-1, 4] > 0.1, st[-1, 4]
    assert costs.max() < 1e4, costs.max()
    assert not np.asarray(res.diverged).any()
    # warm-started resolves converge without iteration spikes (CPU
    # measured [3,3,3,6,6,4,3,3,4,2,4] vs tape-only spikes to 12)
    assert iters[1:].max() <= 9, iters.tolist()
    assert res.final_K is not None
