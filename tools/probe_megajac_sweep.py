#!/usr/bin/env python
"""Sweep megajac (block_b, q_group) on real TPU: compile + run time.

Round-5: the loop-mode kernel compiles (the round-4 vmapped q-tangents
blew VMEM).  Timing discipline: a naive host-side loop pulls the ~11 MB
(fx, fu) through the axon tunnel every rep, which swamps the kernel
time — so each measurement jits ONE program that generates perturbed
inputs on device from a seed, scans REPS jac calls, and returns a
scalar reduction.  Per-call time = (t(REPS) - t(1)) / (REPS - 1),
cancelling dispatch + transfer overhead.

Usage: python tools/probe_megajac_sweep.py [bb:g ...]  (default sweep)
Prints one JSON line per variant.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LANES = 256 * 7
REPS = 16


def main(variants):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10)
    except Exception:
        pass
    import jax.numpy as jnp

    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.multibody.lanejac import make_lane_jac
    from drake_ddp_tpu.ops.megajac import pallas_jac_for_system

    cfg = mc.Config(contact_iters=8)
    system, _ = mc.build_system(cfg)
    model, contact = system.params
    lane = system.lane_step_fn
    x0, _ = mc.initial_and_target(cfg)
    x0j = jnp.asarray(np.asarray(x0, np.float32))
    u0j = jnp.asarray(np.asarray(mc.U_STAND, np.float32))

    def make_timed(jac):
        # runtime rep count -> ONE compiled program per variant
        @jax.jit
        def run(seed, reps):
            def one(k, carry):
                key = jax.random.fold_in(jax.random.PRNGKey(seed), k)
                xT = jnp.tile(x0j[:, None], (1, LANES))
                xT = xT.at[19:].add(0.05 * jax.random.normal(
                    key, (18, LANES)))
                uT = jnp.tile(u0j[:, None], (1, LANES)) + \
                    0.1 * jax.random.normal(key, (12, LANES))
                fx, fu = jac(xT, uT)
                return carry + jnp.sum(fx) + jnp.sum(fu)
            return jax.lax.fori_loop(0, reps, one, 0.0)
        return run

    def bench(jac):
        run = make_timed(jac)
        np.asarray(run(0, 1))                       # warm
        t1s, tNs = [], []
        for rep in range(3):
            t0 = time.time(); np.asarray(run(100 + rep, 1))
            t1s.append(time.time() - t0)
            t0 = time.time(); np.asarray(run(200 + rep, REPS))
            tNs.append(time.time() - t0)
        t1 = sorted(t1s)[1]
        tN = sorted(tNs)[1]
        return (tN - t1) / (REPS - 1), t1, tN

    ljac = jax.jit(make_lane_jac(
        model, contact, system.dt, contact_iters=lane.contact_iters,
        force_params=lane.force_params))
    t_lane, t1, tN = bench(ljac)
    print(json.dumps({"variant": "lane", "t_per_call_s": round(t_lane, 4),
                      "t1": round(t1, 3), "tN": round(tN, 3)}), flush=True)

    for v in variants:
        bb, g = (int(t) for t in v.split(":"))
        out = {"variant": v, "block_b": bb, "q_group": g}
        try:
            pjac = pallas_jac_for_system(system, block_b=bb, q_group=g)
            tw = time.time()
            t, t1, tN = bench(pjac)
            out["t_per_call_s"] = round(t, 4)
            out["t1"] = round(t1, 3)
            out["tN"] = round(tN, 3)
            out["warm_s"] = round(time.time() - tw, 1)
            out["vs_lane"] = round(t_lane / t, 2)
        except Exception as e:
            out["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["128:1", "128:2", "256:1"]
    main(args)
