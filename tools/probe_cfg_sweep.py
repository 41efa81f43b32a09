#!/usr/bin/env python
"""Sweep solver-config variants on the bench chain (real TPU).

PERF.md round-3 phase split: forward (linesearch rollouts) 0.50 /
derivatives 0.32 / backward 0.18.  The forward share is dominated by
``ls_parallel`` candidates evaluated per round (throughput-bound: C=4
costs 4x one rollout across the batch) and by failing lanes grinding
the eps schedule to eps_min=1e-8 (~7 chunk rounds) inside the Levenberg
retry ladder.  This sweeps the candidate levers on short warm chains:

- ls_parallel: 4 (round-3 bench) vs 2 — accepts concentrate in the
  first round (86% measured), so halving the round width halves most
  forward-pass compute if acceptance still lands in round 1.
- eps_min: 1e-8 (reference) vs 1e-4 — accepts below ~1e-4 are f32 cost
  noise (that finding motivated ls_expected_floor), so deep
  backtracking only pads the cost of failure.
- contact_iters: 6 (round-3 bench) vs 4 — with the chain-health grace
  (MPCConfig.freeze_after) recovering transient failures, the cheaper
  Newton may be viable again.

Usage: python tools/probe_cfg_sweep.py [num_chunks] [variant...]
  variant = lsp,eps_min,contact_iters[,max_iters] e.g. 2,1e-4,6,12
Prints one JSON line per variant + a summary line.

All variants run the bench's chain-health policy (rescue seed + garbage
ceiling + grace latch, see bench.py) so results transfer directly.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

MAX_ITERS = 8          # bench.py parity (round 5)
FREEZE_AFTER = 3
COST_CEILING = 1000.0  # bench.py parity (tight 150 kills recovering rescues)
# batch size override (chip-throughput scaling probe): runs/s/chip is
# lanes * resolves/s / 100, so a larger batch wins if latency grows
# sublinearly
BATCH = int(os.environ.get("DDT_SWEEP_BATCH", "256"))


def run_variant(num_chunks, lsp, eps_min, contact_iters,
                max_iters=MAX_ITERS, ceiling=COST_CEILING,
                kp_interval=8):
    import jax
    import jax.numpy as jnp

    from bench_sweep import build
    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.mpc.driver import (MPCConfig, _shift_tape,
                                          mpc_solve_batched,
                                          shift_warm_start_batched)

    system, scfg, cfg, shift, make_prob = build(
        BATCH, contact_iters=contact_iters, kp_interval=kp_interval)
    scfg = scfg._replace(max_iters=max_iters, ls_parallel=lsp,
                         eps_min=eps_min)
    rs = cfg.replan_steps
    mpcc = MPCConfig(num_resolves=5, replan_steps=rs,
                     policy_warm_start=True, freeze_diverged=True,
                     freeze_after=FREEZE_AFTER,
                     resolve_cost_ceiling=ceiling)
    N = scfg.num_steps
    rescue_u = jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32), (N - 1, 1))
    fn = jax.jit(lambda p, c: mpc_solve_batched(system, scfg, p, mpcc,
                                                shift, consec0=c,
                                                rescue_u=rescue_u))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))

    tag = (f"lsp={lsp} eps_min={eps_min} ci={contact_iters}"
           f" mi={max_iters} ceil={ceiling} kp={kp_interval}")
    print(f"{tag}: compiling...", file=sys.stderr, flush=True)
    prob = make_prob(1000)
    consec = jnp.zeros(BATCH, jnp.int32)
    res = fn(prob, consec)
    np.asarray(res.costs)

    prob = make_prob(0)
    consec = jnp.zeros(BATCH, jnp.int32)
    st = time.perf_counter()
    div = 0.0
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
        d = float(np.asarray(res.diverged).mean())
        div += d
        print(f"  chunk {c}: {time.perf_counter() - t0:.1f}s"
              f" div {d:.4f}", file=sys.stderr, flush=True)
    np.asarray(res.costs)
    el = time.perf_counter() - st
    dead = np.asarray(res.dead)
    z_ok = np.asarray(prob.x0[:, 6] > 0.15)
    maxv = np.abs(np.asarray(prob.x0[:, 19:])).max(axis=1)
    rps = BATCH * (6 * num_chunks - 1) / el
    out = {"variant": tag, "seconds": round(el, 1),
           "resolves_per_s": round(rps, 1),
           "runs_per_s_chip": round(rps / 100.0, 4),
           "mean_div": round(div / num_chunks, 4),
           "dead": round(float(dead.mean()), 4),
           "alive_upright": round(float((~dead & z_ok).mean()), 4),
           "healthy": round(
               float((~dead & z_ok & (maxv < 50.0)).mean()), 4)}
    print(json.dumps(out), flush=True)
    return out


def main(num_chunks, variants):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    results = []
    for v in variants:
        try:
            results.append(run_variant(num_chunks, *v))
        except Exception as e:
            print(json.dumps({"variant": repr(v),
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    if results:
        best = max(results, key=lambda r: r["resolves_per_s"])
        print(json.dumps({"best": best}))


if __name__ == "__main__":
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    vs = []
    for a in sys.argv[2:]:
        parts = a.split(",")
        v = [int(parts[0]), float(parts[1]), int(parts[2])]
        if len(parts) > 3:
            v.append(int(parts[3]))
        if len(parts) > 4:
            v.append(float(parts[4]))
        if len(parts) > 5:
            v.append(int(parts[5]))
        vs.append(tuple(v))
    if not vs:
        vs = [(4, 1e-8, 6), (2, 1e-8, 6), (4, 1e-4, 6), (4, 1e-8, 4)]
    main(nc, vs)
