#!/usr/bin/env python
"""Test the rescue-seed hypothesis for persistently failing MPC lanes.

tools/probe_death.py (TPU, round 4) measured p(fail | prev fail) =
0.9986 with only 0.8% of lanes physically fallen: a failed resolve's
coasted warm start (the shifted stale tape whose prediction tail blew
up) is handed to every subsequent resolve, so the lane never finds a
finite incumbent again even though the robot is standing.

Hypothesis: a FRESH solve from the same handoff state with the safe
standing-torque open-loop seed (U_STAND, zero gains — the exact init
that solves the chain entry) converges.  If true, the MPC driver should
re-seed failed lanes instead of coasting their seed forever.

Method: run the no-latch bench chain for [num_chunks] chunks, then solve
one extra resolve from the final handoff two ways — (a) coast seed (the
chain's own), (b) rescue seed — and compare divergence on the subset of
lanes whose last resolve failed.

Usage: python tools/probe_rescue.py [num_chunks]
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

CONTACT_ITERS = 6
MAX_ITERS = 12


def main(num_chunks=8):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench_sweep import build
    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.mpc.driver import (MPCConfig, _shift_tape,
                                          mpc_solve_batched,
                                          shift_warm_start_batched)
    from drake_ddp_tpu.solver.batched import solve_ilqr_batched

    B = 256
    system, scfg, cfg, shift, make_prob = build(B,
                                                contact_iters=CONTACT_ITERS)
    scfg = scfg._replace(max_iters=MAX_ITERS)
    rs = cfg.replan_steps

    mpcc = MPCConfig(num_resolves=5, replan_steps=rs,
                     policy_warm_start=True, freeze_diverged=False)
    fn = jax.jit(lambda p, c: mpc_solve_batched(system, scfg, p, mpcc,
                                                shift, consec0=c))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))
    solve = jax.jit(lambda p: solve_ilqr_batched(system, scfg, p))

    prob = make_prob(0)
    consec = jnp.zeros(B, jnp.int32)
    print("probe: compiling chain...", file=sys.stderr, flush=True)
    for c in range(num_chunks):
        res = fn(prob, consec)
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * 5,
            K_init=_shift_tape(res.final_K, rs, time_axis=1),
            x_ref_init=_shift_tape(res.final_x, rs, time_axis=1),
        )
        consec = res.consec
        print(f"chunk {c}: diverged "
              f"{float(np.asarray(res.diverged).mean()):.4f}",
              file=sys.stderr, flush=True)

    failed = np.asarray(res.diverged)[:, -1]
    nfail = int(failed.sum())
    out = {"num_chunks": num_chunks, "failed_lanes": nfail,
           "failed_frac": round(float(failed.mean()), 4)}
    # state health of the handoff per subset
    v = np.asarray(prob.x0[:, 19:])
    maxv = np.abs(v).max(axis=1)
    z = np.asarray(prob.x0[:, 6])
    out["handoff"] = {
        "maxv_failed_p50": round(float(np.median(maxv[failed])), 2)
        if nfail else None,
        "maxv_healthy_p50": round(float(np.median(maxv[~failed])), 2),
        "z_failed_p50": round(float(np.median(z[failed])), 3)
        if nfail else None,
        "upright_failed": round(float((z[failed] > 0.15).mean()), 4)
        if nfail else None,
    }

    # ---- (a) coast seed: the chain's own next-resolve problem ----
    print("probe: solving coast-seeded resolve...", file=sys.stderr,
          flush=True)
    sol_a = solve(prob)
    div_a = np.asarray(sol_a.diverged)
    cost_a = np.asarray(sol_a.cost)

    # ---- (b) rescue seed: U_STAND open loop, zero gains ----
    N = scfg.num_steps
    rescue = prob._replace(
        u_init=jnp.tile(jnp.asarray(mc.U_STAND, jnp.float32),
                        (B, N - 1, 1)),
        K_init=jnp.zeros_like(prob.K_init),
        x_ref_init=prob.x_ref_init,
    )
    print("probe: solving rescue-seeded resolve...", file=sys.stderr,
          flush=True)
    sol_b = solve(rescue)
    div_b = np.asarray(sol_b.diverged)
    cost_b = np.asarray(sol_b.cost)

    def stats(div, cost):
        s = {"div_all": round(float(div.mean()), 4),
             "div_healthy": round(float(div[~failed].mean()), 4)}
        if nfail:
            s["div_failed"] = round(float(div[failed].mean()), 4)
            ok = failed & ~div
            s["rescued_cost_p50"] = (round(
                float(np.median(cost[ok])), 2) if ok.any() else None)
        return s

    out["coast_seed"] = stats(div_a, cost_a)
    out["rescue_seed"] = stats(div_b, cost_b)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
