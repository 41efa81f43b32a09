#!/usr/bin/env python
"""Split the lane-jac (multibody/lanejac.py) cost on real TPU.

PERF.md round-4: derivatives are 40% of the solve.  jac_T has four cost
groups — primal contact Newton, q-tangents (nq=19 full JVPs through
FK/mass/narrowphase), v-tangents (nv=18 bias-only JVPs), and the
G^-1 assembly.  This times the full jac against ablated builds
(make_lane_jac(_ablate_groups=...) zeroes a group so XLA dead-codes its
JVP) plus the primal lane step, at the flagship derivative-call size
(batch x keypoints lanes).

Usage: python tools/probe_jac_split.py [lanes] [reps]
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LANES = 256 * 7   # batch x keypoints of the flagship derivative call


def main(lanes=LANES, reps=5):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10)
    except Exception:
        pass
    import jax.numpy as jnp

    from drake_ddp_tpu.contact.forces import ContactForceParams
    from drake_ddp_tpu.contact.geometry import (HALFSPACE,
                                                CollisionGeometry,
                                                ContactProps, GeometrySet,
                                                build_contact_model)
    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.io.urdf import add_urdf
    from drake_ddp_tpu.models import mini_cheetah as mini_cheetah_robot
    from drake_ddp_tpu.multibody import lanejac as lj
    from drake_ddp_tpu.multibody.lanestep import make_lane_step
    from drake_ddp_tpu.multibody.model import ModelBuilder

    cfg = mc.Config(contact_iters=8)
    mb = ModelBuilder()
    gs = GeometrySet()
    add_urdf(mb, gs, mini_cheetah_robot(), floating=True)
    ground = ContactProps(modulus=cfg.hydroelastic_modulus,
                          dissipation=cfg.dissipation,
                          mu_static=cfg.mu_static,
                          mu_dynamic=cfg.mu_dynamic,
                          resolution_hint=cfg.resolution_hint)
    gs.add(CollisionGeometry(-1, HALFSPACE, np.zeros(3), np.eye(3),
                             np.zeros(1), ground, name="ground"))
    model = mb.finalize()
    contact = build_contact_model(gs)
    fp = ContactForceParams(smooth_width=cfg.smooth_width)

    rng = np.random.default_rng(0)
    x = np.tile(np.r_[mc.Q0, np.zeros(18)][:, None], (1, lanes))
    x = (x + 0.01 * rng.standard_normal(x.shape)).astype(np.float32)
    u = np.tile(mc.U_STAND[:, None], (1, lanes)).astype(np.float32)
    x = jnp.asarray(x)
    u = jnp.asarray(u)

    def time_fn(f, pick=lambda r: r[0]):
        r = f(x, u)
        np.asarray(pick(r))
        ts = []
        for i in range(reps):
            xv = x + np.float32(1e-6 * (i + 1))
            st = time.perf_counter()
            r = f(xv, u)
            np.asarray(pick(r))
            ts.append(time.perf_counter() - st)
        return round(min(ts) * 1e3, 2)

    build = lambda ab: jax.jit(lj.make_lane_jac(
        model, contact, cfg.dt, contact_iters=cfg.contact_iters,
        force_params=fp, _ablate_groups=ab))

    out = {"lanes": lanes, "reps": reps}
    out["full_ms"] = time_fn(build(()))
    out["no_q_ms"] = time_fn(build(("q",)))
    out["no_qv_ms"] = time_fn(build(("q", "v")))
    out["no_inv_ms"] = time_fn(build(("inv",)))
    out["no_int_ms"] = time_fn(build(("int",)))
    out["no_asm_ms"] = time_fn(build(("asm",)))
    step = jax.jit(make_lane_step(model, contact, cfg.dt,
                                  contact_iters=cfg.contact_iters,
                                  force_params=fp))
    out["primal_step_ms"] = time_fn(step, pick=lambda r: r)
    out["q_group_ms"] = round(out["full_ms"] - out["no_q_ms"], 2)
    out["v_group_ms"] = round(out["no_q_ms"] - out["no_qv_ms"], 2)
    out["inv_ms"] = round(out["full_ms"] - out["no_inv_ms"], 2)
    out["int_fan_ms"] = round(out["full_ms"] - out["no_int_ms"], 2)
    out["asm_ms"] = round(out["full_ms"] - out["no_asm_ms"], 2)

    # the Pallas mega-jac kernel (ops/megajac.py), compiled
    try:
        from drake_ddp_tpu.ops.megajac import make_pallas_jac

        for bb in (64, 128):
            try:
                pj = make_pallas_jac(model, contact, cfg.dt,
                                     contact_iters=cfg.contact_iters,
                                     force_params=fp, block_b=bb)
                out[f"pallas_b{bb}_ms"] = time_fn(pj)
            except Exception as e:
                out[f"pallas_b{bb}_error"] = (
                    f"{type(e).__name__}: {e}"[:200])
    except Exception as e:
        out["pallas_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else LANES
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    main(lanes, reps)
