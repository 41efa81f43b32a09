#!/usr/bin/env python
"""TPU perf sweep over the batched-MPC kernel variants.

Measures steady-state resolve throughput for each (rollout_kernel,
deriv_kernel) combination on the bench problem, one warm chunk each —
the fast way to pick the bench configuration once the TPU tunnel is
back (BENCH_r01 = 0.713 runs/s/chip at rollout=pallas-step,
derivs=xla-jacfwd; round 2 added 'fused' megaroll and 'lane'
structured-IFT, unmeasured on real hardware).

Usage:  python tools/bench_sweep.py [batch] [variants...]
  variants: comma pairs like fused,lane pallas,lane pallas,xla lane,xla
  (default: all four)

Axon gotchas (CLAUDE.md): vary inputs between reps; force with
np.asarray; keep each device call < 1 min.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 256
MAX_ITERS = 12
RESOLVE_CHUNK = 5
JAC_CHUNK = 8


def build(batch, contact_iters=None, kp_interval=8):
    import jax
    import jax.numpy as jnp

    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.solver import keypoints as kp
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem

    cfg = mc.Config() if contact_iters is None else mc.Config(
        contact_iters=contact_iters)
    system, _ = mc.build_system(cfg)
    N = int(cfg.T / cfg.dt)
    Q, R, Qf = mc.costs(cfg)
    x0, x_nom = mc.initial_and_target(cfg)
    n_kp = -(-(N - 1) // kp_interval) + 1
    derivs = kp.DerivsInterpolation("setInterval", minN=kp_interval,
                                    max_keypoints=min(n_kp, N - 1),
                                    jac_chunk=JAC_CHUNK)
    # mirror bench.py's round-5 solver config (lsp=2 / eps_min=1e-3:
    # measured faster AND more stable than the deep schedule)
    scfg = ILQRConfig(num_steps=N, delta=cfg.delta, beta=cfg.beta,
                      max_iters=MAX_ITERS, derivs=derivs, ls_parallel=2,
                      eps_min=1e-3, parallel_backward=False,
                      ls_expected_floor=cfg.delta, cost_ceiling=1e4)
    shift = jnp.zeros(37, jnp.float32).at[4].set(
        cfg.target_vel * cfg.dt * cfg.replan_steps)

    def make_prob(seed):
        key = jax.random.PRNGKey(seed)
        x0b = jnp.tile(jnp.asarray(x0, jnp.float32), (batch, 1))
        x0b = x0b.at[:, 19:].add(
            0.05 * jax.random.normal(key, (batch, 18)))
        tile = lambda a: jnp.tile(jnp.asarray(a, jnp.float32),
                                  (batch, 1, 1))
        return ILQRProblem(
            x0=x0b,
            x_nom=jnp.tile(jnp.asarray(x_nom, jnp.float32), (batch, 1)),
            Q=tile(cfg.dt * Q), R=tile(cfg.dt * R), Qf=tile(Qf),
            u_init=jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32),
                            (batch, N - 1, 1)),
            # arrays (not None) from the start so the chunk loop's
            # K_init/x_ref_init/frozen handoff does not change the
            # pytree structure and recompile mid-measurement (bench.py)
            K_init=jnp.zeros((batch, N - 1, 12, 37), jnp.float32),
            x_ref_init=jnp.tile(x0b[:, None], (1, N, 1)),
            frozen=jnp.zeros((batch,), bool),
        )

    return system, scfg, cfg, shift, make_prob


def main(batch=BATCH, variants=None):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10)
    except Exception:
        pass
    from drake_ddp_tpu.mpc.driver import MPCConfig, mpc_solve_batched

    variants = variants or [("fused", "lane"), ("pallas", "lane"),
                            ("pallas", "xla"), ("lane", "xla")]
    system, scfg, cfg, shift, make_prob = build(batch)
    mpcc = MPCConfig(num_resolves=RESOLVE_CHUNK,
                     replan_steps=cfg.replan_steps)

    results = []
    for rk, dk in variants:
        tag = f"rollout={rk} derivs={dk}"
        try:
            fn = jax.jit(lambda p, rk=rk, dk=dk: mpc_solve_batched(
                system, scfg, p, mpcc, shift,
                rollout_kernel=rk, deriv_kernel=dk))
            print(f"{tag}: compiling...", file=sys.stderr, flush=True)
            res = fn(make_prob(1000))
            np.asarray(res.costs)
            # warm chunk 2 (different inputs) is the measurement
            prob = make_prob(0)
            st = time.perf_counter()
            res = fn(prob)
            div = float(np.asarray(res.diverged).mean())
            el = time.perf_counter() - st
            rps = batch * RESOLVE_CHUNK / el
            print(f"{tag}: {el:.2f} s/chunk -> {rps:.1f} resolves/s/chip"
                  f" (diverged {div:.3f})", flush=True)
            results.append((tag, rps, div))
        except Exception as e:  # keep sweeping past broken variants
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
    print("\nbest:", max(results, key=lambda r: r[1]) if results else None)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else BATCH
    vs = [tuple(a.split(",")) for a in sys.argv[2:]] or None
    main(b, vs)
