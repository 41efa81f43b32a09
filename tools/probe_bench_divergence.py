#!/usr/bin/env python
"""Probe the bench-scale mid-chain divergence on real TPU.

BENCH detail reports mean_diverged_fraction ~0.12 at the flagship
config, yet a cold-start batch-256 solve shows 0 divergence
(tools/profile_phases.py) — divergence appears only once the gait is in
motion (bench chunks 2+).  This probe drives the exact bench chain to a
divergent chunk, then dissects one solve there:

- per-lane ILQRStats (cost / eps / ls_iters per iteration),
- whether "diverged" lanes are physically falling (base height) or
  grinding at the f32 cost-noise floor (improvement below what a
  ~1e3-magnitude f32 cost sum can resolve),
- what the failed linesearches cost the healthy lanes (batched
  while_loop: everyone waits for the slowest lane).

Usage: python tools/probe_bench_divergence.py [num_chunks]
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main(num_chunks=4):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench_sweep import build
    from drake_ddp_tpu.mpc.driver import (MPCConfig, mpc_solve_batched,
                                          shift_warm_start_batched)
    from drake_ddp_tpu.solver.batched import solve_ilqr_batched

    system, scfg, cfg, shift, make_prob = build(256)
    rs = cfg.replan_steps
    mpcc = MPCConfig(num_resolves=5, replan_steps=rs)

    fn = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc, shift))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))
    solve1 = jax.jit(lambda p: solve_ilqr_batched(system, scfg, p))

    prob = make_prob(0)
    print("probe: compiling/chaining...", file=sys.stderr, flush=True)
    chunk_div = []
    for c in range(num_chunks):
        res = fn(prob)
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * mpcc.num_resolves,
        )
        d = float(np.asarray(jnp.mean(res.diverged)))
        chunk_div.append(round(d, 4))
        print(f"probe: chunk {c} diverged {d:.4f}", file=sys.stderr,
              flush=True)

    # physical state of the chain at the handoff: is anyone down?
    z = np.asarray(prob.x0[:, 6])          # base height (quat4 + xyz)
    # one dissected solve at the divergent handoff
    print("probe: dissecting one solve...", file=sys.stderr, flush=True)
    st = time.perf_counter()
    sol = solve1(prob)
    np.asarray(sol.cost)
    solve_s = time.perf_counter() - st

    div = np.asarray(sol.diverged)
    iters = np.asarray(sol.iterations)
    costs = np.asarray(sol.cost)
    stats_cost = np.asarray(sol.stats.cost)        # (B, max_iters)
    stats_eps = np.asarray(sol.stats.eps)
    stats_ls = np.asarray(sol.stats.ls_iters)
    B = div.shape[0]

    def lane_summary(mask):
        if not mask.any():
            return None
        it = iters[mask]
        c = costs[mask]
        # last-iteration cost improvements actually achieved (where the
        # stats table has >= 2 filled rows)
        return {
            "lanes": int(mask.sum()),
            "iterations_mean": float(it.mean()),
            "cost_mean": float(np.nanmean(np.where(np.isfinite(c), c,
                                                   np.nan))),
            "cost_p90": float(np.nanpercentile(
                np.where(np.isfinite(c), c, np.nan), 90)),
            "base_z_mean": float(z[mask].mean()),
            "base_z_min": float(z[mask].min()),
            "ls_iters_mean_last": float(
                np.array([stats_ls[i, max(iters[i] - 1, 0)]
                          for i in np.where(mask)[0]]).mean()),
            "eps_last_mean": float(
                np.array([stats_eps[i, max(iters[i] - 1, 0)]
                          for i in np.where(mask)[0]]).mean()),
        }

    # improvement sizes realized in the final accepted iteration of
    # diverged lanes: distinguishes noise-floor grinding (tiny) from
    # genuine blow-ups (cost rising / inf)
    last_imp = []
    for i in np.where(div)[0]:
        k = iters[i] - 1
        if k >= 1 and np.isfinite(stats_cost[i, k - 1]):
            last_imp.append(float(stats_cost[i, k - 1] - stats_cost[i, k]))
    out = {
        "metric": "bench-chain divergence dissection (TPU)",
        "chunk_diverged": chunk_div,
        "handoff_base_z": {
            "min": float(z.min()), "p05": float(np.percentile(z, 5)),
            "mean": float(z.mean()), "max": float(z.max()),
        },
        "solve_s": round(solve_s, 2),
        "diverged_fraction": float(div.mean()),
        "iterations_mean_all": float(iters.mean()),
        "diverged_lanes": lane_summary(div),
        "healthy_lanes": lane_summary(~div),
        "diverged_last_improvements": {
            "n": len(last_imp),
            "mean": float(np.mean(last_imp)) if last_imp else None,
            "p90_abs": float(np.percentile(np.abs(last_imp), 90))
            if last_imp else None,
        },
        "ls_iters_hist_all_iters": np.bincount(
            stats_ls[stats_ls > 0].ravel(), minlength=8)[:8].tolist(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
