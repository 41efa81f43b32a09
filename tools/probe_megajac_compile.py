#!/usr/bin/env python
"""Diagnose the megajac Mosaic compile failure on real TPU (round 5).

BENCH_r04.json: ops/megajac.py fails TPU compilation (HTTP 500 from
tpu_compile_helper) and bench silently falls back to the lane path.
This probe compiles the kernel alone at flagship shapes and prints the
FULL exception, then bisects with ablated jac bodies
(make_lane_jac(_ablate_groups=...)) to find which tangent group kills
Mosaic (VMEM blow-up vs illegal op).

Usage: python tools/probe_megajac_compile.py [variant ...]
  variants: full qv q v asm int none  (default: full)
    full  = production kernel
    q     = ablate q-tangents (zeroed)
    ...   = see lanejac._ablate_groups
Prints one JSON line per variant.
"""

import json
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ABLATE = {
    "full": (),        # production: q_mode="loop" (the round-5 fix)
    "fullvmap": (),    # round-4 kernel: vmapped q-tangents (VMEM blow-up)
    "q": ("q",),
    "v": ("v",),
    "qv": ("q", "v"),
    "asm": ("asm",),
    "int": ("int",),
    "inv": ("inv",),
    "all": ("q", "v", "asm", "int", "inv"),
}


def build_kernel(ablate, q_mode="loop", block_b=128):
    """make_pallas_jac with an ablated jac body (mirrors ops/megajac.py
    but passes _ablate_groups through to make_lane_jac)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from drake_ddp_tpu.examples import mini_cheetah as mc
    from drake_ddp_tpu.multibody.lanejac import make_lane_jac

    cfg = mc.Config(contact_iters=8)
    system, _ = mc.build_system(cfg)
    model, contact = system.params
    lane = system.lane_step_fn
    n = model.nq + model.nv
    m = model.nu

    jac_T = make_lane_jac(model, contact, system.dt,
                          contact_iters=getattr(lane, "contact_iters", 2),
                          force_params=lane.force_params,
                          _ablate_groups=ablate, q_mode=q_mode)

    x_spec = jax.ShapeDtypeStruct((n, block_b), jnp.float32)
    u_spec = jax.ShapeDtypeStruct((m, block_b), jnp.float32)
    cjaxpr = jax.make_jaxpr(jac_T)(x_spec, u_spec)
    consts = cjaxpr.consts

    def closed(xx, uu, *cs):
        fx, fu = jax.core.eval_jaxpr(cjaxpr.jaxpr, cs, xx, uu)
        return fx, fu

    const_shapes = [c.shape for c in consts]
    consts2d = [jnp.asarray(c).reshape(1, -1) if c.ndim < 2 else
                jnp.asarray(c) for c in consts]

    def kernel(x_ref, u_ref, *refs):
        const_refs = refs[:-2]
        fx_ref, fu_ref = refs[-2:]
        cs = [r[:].reshape(s) for r, s in zip(const_refs, const_shapes)]
        fx, fu = closed(x_ref[:], u_ref[:], *cs)
        fx_ref[:] = fx
        fu_ref[:] = fu

    @jax.jit
    def pallas_jac(x_T, u_T):
        B = x_T.shape[-1]
        grid = (B // block_b,)
        rep = [pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for c in consts2d]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + rep,
            out_specs=[
                pl.BlockSpec((n, n, block_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, m, block_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, n, B), x_T.dtype),
                jax.ShapeDtypeStruct((n, m, B), x_T.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x_T, u_T, *consts2d)

    return pallas_jac, n, m


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

    for name in variants:
        q_mode = "vmap" if name == "fullvmap" else "loop"
        pjac, n, m = build_kernel(ABLATE[name], q_mode=q_mode)
        s = lambda *sh: jax.ShapeDtypeStruct(sh, jnp.float32)
        out = {"variant": name}
        try:
            import time
            t0 = time.time()
            pjac.lower(s(n, 128), s(m, 128)).compile()
            out["ok"] = True
            out["compile_s"] = round(time.time() - t0, 1)
        except Exception as e:
            out["ok"] = False
            out["error_type"] = type(e).__name__
            out["error"] = str(e)[:4000]
            tb = traceback.format_exc()
            sys.stderr.write(tb[-6000:] + "\n")
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["full"]
    main(args)
