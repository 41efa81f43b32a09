#!/usr/bin/env python
"""Probe where batched-MPC solve time goes: iteration / linesearch stats.

Drives the exact bench chain (bench.py config: contact_iters=6, policy
warm start, freeze_diverged) a few chunks in, then runs instrumented
solves at that mid-gait state and dumps, per resolve depth:

- per-lane exit iteration (the batch pays the MAX over lanes — a
  batched while_loop runs until every lane converges or max_iters),
- accepted-eps histogram (if almost everything accepts at eps 1.0 the
  ls_parallel=4 candidate fan wastes ~4x rollout FLOPs on the device,
  which is throughput-bound, not latency-bound),
- per-lane linesearch rounds per iteration (rounds paid = max over
  active lanes).

Usage: python tools/probe_iters.py [chunks_before_probe]
Prints one JSON line; raw arrays to /tmp/probe_iters.npz.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

BATCH = 256
RESOLVE_CHUNK = 5   # resolves per device call — must match the x_nom
                    # advance per chunk (bench.py ties both likewise)


def main(chunks_before=4):
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
    from drake_ddp_tpu.solver.batched import solve_ilqr_batched

    system, scfg, cfg, shift, make_prob = build(BATCH, contact_iters=6)
    rs = cfg.replan_steps
    mpcc = MPCConfig(num_resolves=RESOLVE_CHUNK, replan_steps=rs,
                     policy_warm_start=True, freeze_diverged=True)

    fn = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc, shift))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))
    solve1 = jax.jit(lambda p: solve_ilqr_batched(system, scfg, p))

    prob = make_prob(0)
    print("probe: chaining...", file=sys.stderr, flush=True)
    probes = []
    for c in range(chunks_before):
        res = fn(prob)
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * RESOLVE_CHUNK,
            K_init=_shift_tape(res.final_K, rs, time_axis=1),
            x_ref_init=_shift_tape(res.final_x, rs, time_axis=1),
            frozen=res.diverged[:, -1],
        )
        d = float(np.asarray(jnp.mean(res.diverged)))
        print(f"probe: chunk {c} diverged {d:.4f}", file=sys.stderr,
              flush=True)
        # instrumented single solve at this depth (same warm start the
        # chain's next resolve sees)
        sol = solve1(prob)
        iters = np.asarray(sol.iterations)           # (B,)
        eps = np.asarray(sol.stats.eps)              # (B, max_iters)
        lsr = np.asarray(sol.stats.ls_iters)         # (B, max_iters)
        frozen = np.asarray(prob.frozen)
        probes.append({"chunk": c, "iters": iters, "eps": eps,
                       "ls_rounds": lsr, "frozen": frozen})

    np.savez("/tmp/probe_iters.npz", **{
        f"{k}_{p['chunk']}": p[k] for p in probes
        for k in ("iters", "eps", "ls_rounds", "frozen")})

    out = []
    for p in probes:
        live = ~p["frozen"]
        iters = p["iters"][live]
        max_it = int(iters.max()) if iters.size else 0
        # eps rows are 0 beyond a lane's exit iteration and for failed
        # iterations; count accepted entries only
        eps = p["eps"][live]
        acc = eps[eps > 0]
        hist = {f"{v:g}": int((acc == v).sum())
                for v in np.unique(acc)} if acc.size else {}
        lsr = p["ls_rounds"][live]
        # rounds the BATCH paid at outer iteration i = max over lanes
        paid = lsr.max(axis=0) if lsr.size else np.zeros(1)
        out.append({
            "chunk": p["chunk"],
            "live_lanes": int(live.sum()),
            "iters_median": float(np.median(iters)) if iters.size else 0,
            "iters_p90": float(np.percentile(iters, 90)) if iters.size else 0,
            "iters_max": max_it,
            "eps_accepted_hist": hist,
            "ls_rounds_paid_per_iter": [int(v) for v in paid],
            "ls_rounds_lane_mean": float(lsr[lsr > 0].mean())
            if (lsr > 0).any() else 0.0,
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
