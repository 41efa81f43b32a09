#!/usr/bin/env python
"""Dissect bench-scale lane death: transient solver failures vs falls.

BENCH_r03: with freeze_diverged latching on the FIRST failed resolve,
43% of lanes were dead by resolve 119 and the per-chunk diverged
fraction ramped ~1-2%/chunk — consistent with a small per-resolve
transient failure rate compounding through the latch, NOT with lanes
physically falling.  This probe runs the exact bench chain WITHOUT the
latch (freeze_diverged=False, policy warm start on) and records, per
resolve and per lane, the diverged flag, the solve cost, and the base
height — enough to measure:

- P(fail at r+1 | fail at r): recoverability of a failed resolve,
- whether ever-failed lanes are fallen (min base z < 0.15) or upright,
- the steady-state per-resolve transient rate.

Usage: python tools/probe_death.py [num_chunks] [freeze_after]
  freeze_after > 0 additionally runs a latched chain with that grace
  and reports its dead/upright fractions for comparison.
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

CONTACT_ITERS = 6   # bench.py flagship config
MAX_ITERS = 12


def _chain(fn, vshift, make_prob, shift, rs, num_chunks, jnp, _shift_tape,
           use_latch):
    prob = make_prob(0)
    consec = jnp.zeros(prob.x0.shape[0], jnp.int32)
    divs, costs, zs = [], [], []
    st = time.perf_counter()
    for c in range(num_chunks):
        res = fn(prob, consec)
        kw = dict(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * 5,
            K_init=_shift_tape(res.final_K, rs, time_axis=1),
            x_ref_init=_shift_tape(res.final_x, rs, time_axis=1),
        )
        if use_latch:
            kw["frozen"] = res.dead
            consec = res.consec
        prob = prob._replace(**kw)
        divs.append(np.asarray(res.diverged))          # (B, 6)
        costs.append(np.asarray(res.costs))            # (B, 6)
        # base z at each resolve's handoff point within the chunk
        zz = np.asarray(res.states[:, :, 6])           # (B, total)
        zs.append(zz)
        print(f"chunk {c}: diverged {divs[-1].mean():.4f}",
              file=sys.stderr, flush=True)
    el = time.perf_counter() - st
    dead = np.asarray(res.dead) if use_latch else None
    z_final = np.asarray(prob.x0[:, 6])
    return (np.concatenate(divs, axis=1), np.concatenate(costs, axis=1),
            zs, z_final, el, dead)


def main(num_chunks=12, freeze_after=0):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench_sweep import build
    from drake_ddp_tpu.mpc.driver import (MPCConfig, _shift_tape,
                                          mpc_solve_batched,
                                          shift_warm_start_batched)

    system, scfg, cfg, shift, make_prob = build(
        256, contact_iters=CONTACT_ITERS)
    scfg = scfg._replace(max_iters=MAX_ITERS)
    rs = cfg.replan_steps
    out = {"num_chunks": num_chunks, "contact_iters": CONTACT_ITERS}

    # ---- run 1: no latch — measure recoverability ----
    mpcc = MPCConfig(num_resolves=5, replan_steps=rs,
                     policy_warm_start=True, freeze_diverged=False)
    fn = jax.jit(lambda p, c: mpc_solve_batched(system, scfg, p, mpcc,
                                                shift, consec0=c))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))
    print("probe: compiling no-latch chain...", file=sys.stderr, flush=True)
    div, cost, zs, z_final, el, _ = _chain(
        fn, vshift, make_prob, shift, rs, num_chunks, jnp, _shift_tape,
        use_latch=False)
    B, R = div.shape
    # transition stats
    f_then_f = (div[:, :-1] & div[:, 1:]).sum()
    f_total = div[:, :-1].sum()
    ever = div.any(axis=1)
    min_z = np.min(np.stack([z.min(axis=1) for z in zs]), axis=0)
    fallen = min_z < 0.15
    out["no_latch"] = {
        "resolves": int(R),
        "seconds": round(el, 1),
        "mean_div": round(float(div.mean()), 4),
        "final_div": round(float(div[:, -1].mean()), 4),
        "ever_failed_frac": round(float(ever.mean()), 4),
        "p_fail_given_prev_fail": round(float(f_then_f / max(f_total, 1)), 4),
        "per_resolve_fresh_rate": round(
            float((div[:, 1:] & ~div[:, :-1]).mean()), 5),
        "fallen_frac": round(float(fallen.mean()), 4),
        "ever_failed_and_fallen": round(float((ever & fallen).mean()), 4),
        "ever_failed_not_fallen": round(float((ever & ~fallen).mean()), 4),
        "fallen_never_failed": round(float((fallen & ~ever).mean()), 4),
        "upright_final": round(float((z_final > 0.15).mean()), 4),
        # cost of failed resolves when they happen (median over events)
        "median_cost_at_fail": round(float(np.median(cost[div]))
                                     if div.any() else 0.0, 2),
        "p90_cost_healthy": round(float(np.percentile(cost[~div], 90)), 2),
    }
    print(json.dumps(out["no_latch"]), file=sys.stderr, flush=True)

    # ---- run 2 (optional): latched with grace ----
    if freeze_after > 0:
        mpcc2 = MPCConfig(num_resolves=5, replan_steps=rs,
                          policy_warm_start=True, freeze_diverged=True,
                          freeze_after=freeze_after)
        fn2 = jax.jit(lambda p, c: mpc_solve_batched(
            system, scfg, p, mpcc2, shift, consec0=c))
        print(f"probe: compiling latched chain (grace {freeze_after})...",
              file=sys.stderr, flush=True)
        div2, cost2, zs2, z_final2, el2, dead2 = _chain(
            fn2, vshift, make_prob, shift, rs, num_chunks, jnp,
            _shift_tape, use_latch=True)
        out[f"latched_grace{freeze_after}"] = {
            "seconds": round(el2, 1),
            "mean_div": round(float(div2.mean()), 4),
            "dead_final": round(float(dead2.mean()), 4),
            "upright_final": round(float((z_final2 > 0.15).mean()), 4),
            "alive_and_upright": round(
                float((~dead2 & (z_final2 > 0.15)).mean()), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    fa = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    main(nc, fa)
