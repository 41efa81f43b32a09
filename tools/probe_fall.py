#!/usr/bin/env python
"""Dissect the nominal-lane gait fall around resolve ~20 (real TPU).

probe_walk.py showed the ZERO-noise bench chain falls during chunk 3-4
(resolves ~18-28).  This probe runs the nominal chain with configurable
max_iters and reports, per resolve: iterations used, solve cost, and the
base height at the end of the resolve's replan window — enough to tell
budget-limited solves (iterations pinned at max) from model-level gait
collapse (converged solves that still tip over).

Usage: python tools/probe_fall.py [max_iters] [num_chunks] [minN] [pws]
(pws=1 seeds every resolve with the previous solution's LQR policy —
MPCConfig.policy_warm_start.)  Prints one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main(max_iters=12, num_chunks=6, minN=8, pws=False,
         contact_iters=None):
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
    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.solver import keypoints as kp

    system, scfg, cfg, shift, make_prob = build(
        256, contact_iters=contact_iters)
    derivs = kp.DerivsInterpolation(
        "setInterval", minN=minN, max_keypoints=48 // minN + 1,
        jac_chunk=scfg.derivs.jac_chunk)
    scfg = scfg._replace(max_iters=max_iters, derivs=derivs)
    rs = cfg.replan_steps
    mpcc = MPCConfig(num_resolves=5, replan_steps=rs,
                     policy_warm_start=pws)
    fn = jax.jit(lambda p: mpc_solve_batched(system, scfg, p, mpcc, shift))
    vshift = jax.jit(lambda u: shift_warm_start_batched(u, rs))

    x0c, _ = mc.initial_and_target(cfg)
    x0b = jnp.tile(jnp.asarray(x0c, jnp.float32), (256, 1))
    prob = make_prob(0)._replace(x0=x0b)

    resolves = []
    print(f"probe_fall: max_iters={max_iters} minN={minN} "
          f"ci={contact_iters} pws={pws}, compiling...",
          file=sys.stderr, flush=True)
    from drake_ddp_tpu.mpc.driver import _shift_tape

    for c in range(num_chunks):
        res = fn(prob)
        prob = prob._replace(
            x0=res.final_x[:, rs],
            u_init=vshift(res.final_u),
            x_nom=prob.x_nom + shift[None, :] * mpcc.num_resolves,
        )
        if pws:  # carry the policy across the chunk boundary too
            prob = prob._replace(
                K_init=_shift_tape(res.final_K, rs, time_axis=1),
                x_ref_init=_shift_tape(res.final_x, rs, time_axis=1))
        iters = np.asarray(res.iterations[0])       # (6,) nominal lane
        costs = np.asarray(res.costs[0])
        div = np.asarray(res.diverged[0])
        # z at each resolve boundary inside this chunk: states holds the
        # stitched trajectory; resolve i's window starts at i*rs
        st = np.asarray(res.states[0])
        for i in range(len(iters)):
            z_end = float(st[min((i + 1) * rs, st.shape[0] - 1), 6])
            resolves.append({
                "iters": int(iters[i]), "cost": round(float(costs[i]), 1),
                "div": bool(div[i]), "z": round(z_end, 3),
            })
        # drift diagnostics on the nominal lane's handoff state: position
        # lag behind the moving target, quaternion alignment with the
        # standing pose, and the largest velocity anywhere in the final
        # prediction (an exploding tail shows here first)
        x0h = np.asarray(prob.x0[0])
        xnh = np.asarray(prob.x_nom[0])
        qdot = float(abs(np.dot(x0h[:4], xnh[:4])
                         / max(np.linalg.norm(x0h[:4]) *
                               np.linalg.norm(xnh[:4]), 1e-9)))
        vmax = float(np.abs(np.asarray(res.final_x[0])[:, 19:]).max())
        print(f"probe_fall: chunk {c} iters={iters.tolist()} "
              f"costs={np.round(costs, 1).tolist()} "
              f"z_end={resolves[-1]['z']} "
              f"lag={xnh[4] - x0h[4]:.3f} qdot={qdot:.4f} "
              f"vmax={vmax:.1f}", file=sys.stderr, flush=True)
        if resolves[-1]["z"] < 0.05:
            print("probe_fall: fallen; stopping early", file=sys.stderr,
                  flush=True)
            break
    print(json.dumps({"max_iters": max_iters, "minN": minN, "pws": pws,
                      "resolves": resolves}))


if __name__ == "__main__":
    mi = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    nc = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    mn = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pw = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
    ci = int(sys.argv[5]) if len(sys.argv) > 5 else None
    main(mi, nc, mn, pw, ci)
