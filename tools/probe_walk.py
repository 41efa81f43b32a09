#!/usr/bin/env python
"""Long-chain walking-quality probe at the bench config (real TPU).

bench.py's upright_fraction_final exposed that most noise-perturbed
lanes fall before resolve 119.  This probe attributes the falls: it runs
the EXACT bench program (same shapes + solver config, so the persistent
compile cache is reused) with different initial-velocity noise scales
and reports per-chunk upright fraction + base-height stats.

Usage: python tools/probe_walk.py [noise1,noise2,...]   (default 0,0.02,0.05)
Prints one JSON line per noise scale.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

NUM_CHUNKS = 20


def main(noises):
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

    system, scfg, cfg, shift, make_prob = build(256)
    rs = cfg.replan_steps
    mpcc = MPCConfig(num_resolves=5, replan_steps=rs)
    fn = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc, shift))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))

    base = make_prob(0)

    from drake_ddp_tpu.examples import mini_cheetah as mc

    x0c, _ = mc.initial_and_target(cfg)
    for noise in noises:
        key = jax.random.PRNGKey(7)
        x0b = jnp.tile(jnp.asarray(x0c, jnp.float32), (256, 1))
        x0b = x0b.at[:, 19:].add(
            noise * jax.random.normal(key, (256, 18)))
        prob = base._replace(x0=x0b)
        per_chunk = []
        for c in range(NUM_CHUNKS):
            res = fn(prob)
            prob = prob._replace(
                x0=res.final_x[:, rs],
                u_init=vshift(res.final_u),
                x_nom=prob.x_nom + shift[None, :] * mpcc.num_resolves,
            )
            z = np.asarray(prob.x0[:, 6])
            xfwd = np.asarray(prob.x0[:, 4])
            per_chunk.append({
                "upright": round(float((z > 0.15).mean()), 4),
                "z_mean": round(float(z.mean()), 3),
                "z_p05": round(float(np.percentile(z, 5)), 3),
                "x_mean": round(float(xfwd.mean()), 3),
                "div": round(float(np.asarray(res.diverged).mean()), 4),
            })
            print(f"probe: noise={noise} chunk {c} {per_chunk[-1]}",
                  file=sys.stderr, flush=True)
        print(json.dumps({"noise": noise, "chunks": per_chunk}))


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "0,0.02,0.05"
    main([float(s) for s in arg.split(",")])
