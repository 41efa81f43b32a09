#!/usr/bin/env python
"""Probe: why does the kinova 'side' full solve stall at ~3.5 mm ball
displacement?  Sweeps solver/contact settings and reports ball motion.

Usage: python tools/probe_kinova.py ci=4 sw=0.003 delta=1e-5 iters=40
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(ci=2, sw=None, delta=1e-3, iters=100, scenario="side"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from drake_ddp_tpu.contact.forces import ContactForceParams
    from drake_ddp_tpu.examples import kinova_gen3 as kg
    from drake_ddp_tpu.multibody.algorithms import gravity_compensation
    from drake_ddp_tpu.multibody.plant import make_multibody_system
    from drake_ddp_tpu.solver.api import IterativeLinearQuadraticRegulator

    cfg = dataclasses.replace(kg.Config(), scenario=scenario,
                              contact_iters=ci)
    _, model = kg.build_system(cfg)
    from drake_ddp_tpu.examples.kinova_gen3 import build_system

    system0, model = build_system(cfg)
    fp = (ContactForceParams() if sw is None
          else ContactForceParams(smooth_width=sw))
    system = make_multibody_system(model, system0.params[1], cfg.dt,
                                   contact_iters=ci, force_params=fp)
    N = int(cfg.T / cfg.dt)
    ilqr = IterativeLinearQuadraticRegulator(
        system, N, beta=cfg.beta, delta=delta, gamma=cfg.gamma,
        max_iters=iters, verbose=True, raise_on_divergence=False)
    x0, x_nom = kg.scenario_states(cfg)
    Q, R, Qf = kg.costs(cfg)
    ilqr.SetInitialState(x0)
    ilqr.SetTargetState(x_nom)
    ilqr.SetRunningCost(cfg.dt * Q, cfg.dt * R)
    ilqr.SetTerminalCost(Qf)
    u_gc = np.asarray(gravity_compensation(
        model, jnp.asarray(x0[:model.nq], jnp.float32)))
    ilqr.SetInitialGuess(np.repeat(u_gc[None].T, N - 1, axis=1))

    st = time.time()
    x, u, t, c = ilqr.Solve()
    print("elapsed", round(time.time() - st, 1))
    print("cfg:", f"ci={ci} sw={sw} delta={delta} iters={iters}")
    print("ball final:", np.round(x[11:14, -1], 4), "target:",
          x_nom[11:14], "start:", x0[11:14])
    disp = x[11:14, -1] - x0[11:14]
    goal = x_nom[11:14] - x0[11:14]
    prog = float(np.dot(disp, goal) / max(np.dot(goal, goal), 1e-9))
    print("progress toward target: %.1f%%  cost %.4f" % (100 * prog, c))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = (v if k == "scenario"
                 else int(v) if k in ("ci", "iters") else float(v))
    main(**kw)
