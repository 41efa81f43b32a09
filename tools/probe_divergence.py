#!/usr/bin/env python
"""Probe: cold-start divergence fraction of the bench MPC chain (CPU).

Reproduces bench.py's exact problem (mini-cheetah MPC, noisy standing
starts, warm-started chunked resolves) at a reduced batch on CPU and
reports the per-resolve diverged fraction plus diagnostics for the lanes
that diverge — the VERDICT item-4 root-cause tool (BENCH_r01:
mean_diverged_fraction 0.059; target < 0.01).

Usage: python tools/probe_divergence.py [batch] [chunks]
"""

import sys
import time

import numpy as np


def main(batch=64, chunks=2):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.mpc.driver import (MPCConfig, mpc_solve_batched,
                                          shift_warm_start_batched)
    from drake_ddp_tpu.solver import keypoints as kp
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem

    MAX_ITERS, RESOLVE_CHUNK, JAC_CHUNK = 12, 5, 8
    cfg = mc.Config()
    system, _ = mc.build_system(cfg)
    N = int(cfg.T / cfg.dt)
    Q, R, Qf = mc.costs(cfg)
    x0, x_nom = mc.initial_and_target(cfg)
    rs = cfg.replan_steps

    derivs = kp.DerivsInterpolation("setInterval", minN=8,
                                    max_keypoints=8, jac_chunk=JAC_CHUNK)
    scfg = ILQRConfig(num_steps=N, delta=cfg.delta, beta=cfg.beta,
                      max_iters=MAX_ITERS, derivs=derivs, ls_parallel=4,
                      parallel_backward=False)
    mpcc = MPCConfig(num_resolves=RESOLVE_CHUNK, replan_steps=rs)
    shift = jnp.zeros(37, jnp.float32).at[4].set(
        cfg.target_vel * cfg.dt * rs)

    key = jax.random.PRNGKey(0)
    x0b = jnp.tile(jnp.asarray(x0, jnp.float32), (batch, 1))
    x0b = x0b.at[:, 19:].add(0.05 * jax.random.normal(key, (batch, 18)))
    tile = lambda a: jnp.tile(jnp.asarray(a, jnp.float32), (batch, 1, 1))
    prob = ILQRProblem(
        x0=x0b,
        x_nom=jnp.tile(jnp.asarray(x_nom, jnp.float32), (batch, 1)),
        Q=tile(cfg.dt * Q), R=tile(cfg.dt * R), Qf=tile(Qf),
        u_init=jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32),
                        (batch, N - 1, 1)),
    )

    fn = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc, shift))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))

    for c in range(chunks):
        st = time.time()
        res = fn(prob)
        div = np.asarray(res.diverged)          # (resolves+1, B) or (B, r)
        costs = np.asarray(res.costs)
        iters = np.asarray(res.iterations)
        print(f"chunk {c}  ({time.time() - st:.0f} s)")
        print("  diverged shape:", div.shape, " mean:", div.mean())
        # per-resolve divergence within the chunk
        axis_b = 1 if div.shape[0] != batch else 0
        per_resolve = div.mean(axis=axis_b)
        print("  per-resolve diverged frac:", np.round(per_resolve, 4))
        lanes = np.where(div.any(axis=0 if axis_b == 1 else 1))[0]
        print("  diverged lanes:", lanes[:20], "..." if len(lanes) > 20
              else "")
        for ln in lanes[:8]:
            cl = costs[:, ln] if axis_b == 1 else costs[ln]
            il = iters[:, ln] if axis_b == 1 else iters[ln]
            dl = div[:, ln] if axis_b == 1 else div[ln]
            print(f"    lane {ln}: cost={np.array2string(cl, precision=1)}"
                  f" iters={il} div={dl.astype(int)}")
        print("  cost spread (finite):",
              np.percentile(costs[np.isfinite(costs)], [50, 90, 99]))
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * RESOLVE_CHUNK,
        )


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(b, c)
