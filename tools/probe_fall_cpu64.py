#!/usr/bin/env python
"""f64 CPU twin of probe_fall: is the long-chain gait collapse a
PRECISION artifact (f32 TPU) or algorithmic?

Runs the nominal bench chain (policy warm start, same solver config) in
float64 on CPU, B=1.  If the f64 chain also collapses around the same
resolve, the failure is in the cost/robustness structure, not numerics.

Usage: python tools/probe_fall_cpu64.py [max_iters] [num_chunks]
                                        [contact_iters] [batch]
``batch > 1`` perturbs initial joint velocities with the bench's 0.05
noise (seed 0) — the round-4 question: the bench's lane failures are
stumble cascades seeded by that noise; do they also happen in f64?
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(max_iters=12, num_chunks=20, contact_iters=None, batch=1):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.mpc.driver import (MPCConfig, _shift_tape,
                                          mpc_solve_batched,
                                          shift_warm_start_batched)
    from drake_ddp_tpu.solver import keypoints as kp
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem

    cfg = mc.Config() if contact_iters is None else mc.Config(
        contact_iters=contact_iters)
    system, _ = mc.build_system(cfg)
    N = int(cfg.T / cfg.dt)
    Q, R, Qf = mc.costs(cfg)
    x0, x_nom = mc.initial_and_target(cfg)
    rs = cfg.replan_steps
    derivs = kp.DerivsInterpolation("setInterval", minN=8,
                                    max_keypoints=8, jac_chunk=8)
    scfg = ILQRConfig(num_steps=N, delta=cfg.delta, beta=cfg.beta,
                      max_iters=max_iters, derivs=derivs, ls_parallel=4,
                      ls_expected_floor=cfg.delta, cost_ceiling=1e4)
    mpcc = MPCConfig(num_resolves=5, replan_steps=rs,
                     policy_warm_start=True)
    shift = jnp.zeros(37, jnp.float64).at[4].set(
        cfg.target_vel * cfg.dt * rs)
    B = batch
    tile = lambda a, s: jnp.tile(jnp.asarray(a, jnp.float64), s)
    x0b = tile(x0, (B, 1))
    if B > 1:
        x0b = x0b.at[:, 19:].add(0.05 * jax.random.normal(
            jax.random.PRNGKey(0), (B, 18), jnp.float64))
    prob = ILQRProblem(
        x0=x0b, x_nom=tile(x_nom, (B, 1)),
        Q=tile(cfg.dt * Q, (B, 1, 1)), R=tile(cfg.dt * R, (B, 1, 1)),
        Qf=tile(Qf, (B, 1, 1)),
        u_init=tile(mc.U_STAND, (B, N - 1, 1)))
    fn = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc, shift))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))

    out = []
    for c in range(num_chunks):
        res = fn(prob)
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * mpcc.num_resolves,
            K_init=_shift_tape(res.final_K, rs, time_axis=1),
            x_ref_init=_shift_tape(res.final_x, rs, time_axis=1),
        )
        costs = np.asarray(res.costs)                    # (B, 6)
        z = np.asarray(prob.x0[:, 6])
        vmax = np.abs(np.asarray(res.final_x)[:, :, 19:]).max(axis=(1, 2))
        lag = np.asarray(prob.x_nom[:, 4] - prob.x0[:, 4])
        div = np.asarray(res.diverged)
        rec = {"chunk": c, "cost_max": round(float(costs.max()), 1),
               "div_frac": round(float(div.mean()), 4),
               "z_min": round(float(z.min()), 3),
               "vmax": round(float(vmax.max()), 1),
               "lag_max": round(float(lag.max()), 3),
               "iters_max": int(np.asarray(res.iterations).max())}
        out.append(rec)
        print(f"cpu64: {rec}", file=sys.stderr, flush=True)
        if float(z.min()) < 0.05 or not np.isfinite(costs).all():
            print("cpu64: a lane fell or went non-finite",
                  file=sys.stderr, flush=True)
            break
    print(json.dumps({"max_iters": max_iters,
                      "contact_iters": contact_iters, "chunks": out}))


if __name__ == "__main__":
    mi = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    nc = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    ci = int(sys.argv[3]) if len(sys.argv) > 3 else None
    main(mi, nc, ci)
