#!/usr/bin/env python
"""Per-phase timing of the batched flagship solve on real TPU.

Answers the standing perf criterion "derivative time < 25% of
iteration" (reference's own bottleneck statement, README.md:51,72) by
running solver/profile.profiled_solve_batched — the host-stepped twin
of the fused batched solver with per-phase blocked device calls — at
the bench problem/config.  Phase *ratios* are the signal; the sum is an
upper bound on the fused solve (see solver/profile.py caveats).

Usage: python tools/profile_phases.py [batch] [rollout_kernel]
Prints one JSON line with phase totals/fractions.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 256


def main(batch=BATCH, rollout_kernel="auto"):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10)
    except Exception:
        pass
    from bench_sweep import build

    from drake_ddp_tpu.solver.profile import profiled_solve_batched

    system, scfg, cfg, shift, make_prob = build(batch, contact_iters=8)

    # warm every phase executable (first call pays compiles)
    print("profile: compiling...", file=sys.stderr, flush=True)
    sol, _ = profiled_solve_batched(system, scfg, make_prob(1000),
                                    rollout_kernel=rollout_kernel)
    np.asarray(sol.cost)
    print("profile: warm, measuring...", file=sys.stderr, flush=True)
    st = time.perf_counter()
    sol, times = profiled_solve_batched(system, scfg, make_prob(0),
                                        rollout_kernel=rollout_kernel)
    np.asarray(sol.cost)
    wall = time.perf_counter() - st
    t = times.totals()
    f = times.fractions()
    out = {
        "metric": "flagship solve phase fractions (profiled twin, TPU)",
        "batch": batch,
        "rollout_kernel": rollout_kernel,
        "iterations_mean": float(np.asarray(sol.iterations).mean()),
        "diverged_fraction": float(np.asarray(sol.diverged).mean()),
        "totals_s": {k: round(v, 4) for k, v in t.items()},
        "fractions": {k: round(v, 4) for k, v in f.items()},
        "derivs_under_25pct": bool(f["derivs"] < 0.25),
        "wall_s": round(wall, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else BATCH
    rk = sys.argv[2] if len(sys.argv) > 2 else "auto"
    main(b, rk)
