#!/usr/bin/env python
"""300+-resolve chain-health probe at the EXACT bench config (round 5).

BENCH_r04 showed per-chunk diverged fraction ramping monotonically
0 -> 1.8% over 119 resolves with no sign of saturation; VERDICT item 3
asks whether the ramp continues (slow-tail failure mode to root-cause)
or saturates (record it).  This runs the bench chain for ``num_chunks``
x 6 resolves (entry + 5) and records the FULL per-chunk series:
diverged fraction, cumulative dead fraction, healthy fraction, cost
percentiles — enough to fit the tail shape.

Usage: python tools/probe_longchain.py [num_chunks=50] [batch=256]
Prints one JSON line (full series included).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main(num_chunks=50, batch=256, eps_min=1e-3, max_iters=8,
         freeze_after=3):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench_sweep import build
    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.mpc.driver import (MPCConfig, _shift_tape,
                                          mpc_solve_batched,
                                          shift_warm_start_batched)

    system, scfg, cfg, shift, make_prob = build(batch, contact_iters=8)
    # bench.py parity: max_iters=8, ceiling 1e3, rescue, grace 3
    scfg = scfg._replace(max_iters=max_iters, eps_min=eps_min)
    rs = cfg.replan_steps
    N = scfg.num_steps
    mpcc = MPCConfig(num_resolves=5, replan_steps=rs,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=freeze_after, resolve_cost_ceiling=1e3)
    rescue_u = jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32), (N - 1, 1))
    fn = jax.jit(lambda p, c: mpc_solve_batched(system, scfg, p, mpcc,
                                                shift, consec0=c,
                                                rescue_u=rescue_u))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))

    print("longchain: compiling...", file=sys.stderr, flush=True)
    res = fn(make_prob(1000), jnp.zeros(batch, jnp.int32))
    np.asarray(res.costs)

    prob = make_prob(0)
    consec = jnp.zeros(batch, jnp.int32)
    series = {"div": [], "dead": [], "healthy": [], "cost_p50": [],
              "cost_p90": [], "fresh_bad": [], "t_s": []}
    ever_bad = np.zeros(batch, bool)
    st = time.perf_counter()
    for c in range(num_chunks):
        t0 = time.perf_counter()
        res = fn(prob, consec)
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * 5,
            K_init=_shift_tape(res.final_K, rs, time_axis=1),
            x_ref_init=_shift_tape(res.final_x, rs, time_axis=1),
            frozen=res.dead,
        )
        consec = res.consec
        div = np.asarray(res.diverged)          # (B, 6)
        dead = np.asarray(res.dead)
        costs = np.asarray(res.costs)
        fin = costs[np.isfinite(costs)]
        x0n = np.asarray(prob.x0)
        z_ok = x0n[:, 6] > 0.15
        maxv = np.abs(x0n[:, 19:]).max(axis=1)
        bad_now = div.any(axis=1)
        fresh = float((bad_now & ~ever_bad).mean())
        ever_bad |= bad_now
        series["div"].append(round(float(div.mean()), 5))
        series["dead"].append(round(float(dead.mean()), 5))
        series["healthy"].append(round(
            float((~dead & z_ok & (maxv < 50.0)).mean()), 5))
        series["cost_p50"].append(round(float(np.median(fin)), 3))
        series["cost_p90"].append(round(float(np.percentile(fin, 90)), 3))
        series["fresh_bad"].append(round(fresh, 5))
        series["t_s"].append(round(time.perf_counter() - t0, 2))
        print(f"  chunk {c}: div {series['div'][-1]:.4f} dead "
              f"{series['dead'][-1]:.4f} healthy "
              f"{series['healthy'][-1]:.4f}", file=sys.stderr, flush=True)
    el = time.perf_counter() - st
    resolves = 6 * num_chunks - 1
    half = num_chunks // 2
    out = {
        "resolves": resolves, "batch": batch, "eps_min": eps_min,
        "max_iters": max_iters, "freeze_after": freeze_after,
        "seconds": round(el, 1),
        "runs_per_s_chip": round(batch * resolves / el / 100.0, 4),
        "dead_final": series["dead"][-1],
        "healthy_final": series["healthy"][-1],
        "ever_bad_final": round(float(ever_bad.mean()), 4),
        "div_mean_first_half": round(
            float(np.mean(series["div"][:half])), 5),
        "div_mean_second_half": round(
            float(np.mean(series["div"][half:])), 5),
        "series": series,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 50, int(a[1]) if len(a) > 1 else 256,
         float(a[2]) if len(a) > 2 else 1e-3,
         int(a[3]) if len(a) > 3 else 8,
         int(a[4]) if len(a) > 4 else 3)
