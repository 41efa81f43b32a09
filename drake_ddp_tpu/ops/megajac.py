"""Pallas mega-jac kernel: the structured-IFT step Jacobian in VMEM.

multibody/lanejac.py evaluates (fx, fu) = d step / d (x, u) via the
implicit function theorem: one primal contact Newton, nq full q-tangent
JVPs, nv cheap v-tangent JVPs, a Gauss-Jordan G^-1, and the assembly
contractions.  Compiled by XLA that program is MOVEMENT-bound, not
compute-bound: at the flagship derivative-call size (1792 lanes) it runs
~11x slower than the equivalent step count through the Pallas mega-step
kernel, and ablation probes (tools/probe_jac_split.py) show the time is
smeared across the whole op graph (layout shuffles between hundreds of
small lane-major tensors), not concentrated in any one stage — the same
failure mode ops/megastep.py fixed for the rollout.

So: run the ENTIRE jac_T body as one Pallas program per lane tile.  The
body is *the same traced code* as multibody/lanejac.py (which builds on
the Mosaic-safe lanestep `_T` helpers; `jax.jvp` at trace time lowers to
ordinary elementwise/slice ops of the same family), so the kernel
inherits lanejac's equivalence tests.  Consts are hoisted from the
jaxpr exactly as in ops/megastep.py.

Tile size: Mosaic requires the out-block's last dim divisible by 128
(the (n, n, block_b) 3D blocks put block_b last), so ``block_b=128`` is
the minimum legal tile; the jac body's ~3-4x intermediates fit under
the compiler's VMEM budget at flagship sizes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.multibody.lanejac import make_lane_jac


def make_pallas_jac(
    model,
    contact,
    dt: float,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
    block_b: int = 128,
    interpret: bool = False,
) -> Optional[Callable[[jax.Array, jax.Array],
                       tuple[jax.Array, jax.Array]]]:
    """Build a lane-major Jacobian kernel (x_T (n, B), u_T (m, B)) ->
    (fx (n, n, B), fu (n, m, B)) running as one Pallas program per
    ``block_b`` lane tile.  B is padded internally to a tile multiple
    (lanes are independent).  Returns None for unactuated models."""
    n = model.nq + model.nv
    m = model.nu
    if m == 0:
        return None   # fu would need a zero-width block
    jac_T = make_lane_jac(model, contact, dt,
                          contact_iters=contact_iters,
                          force_params=force_params)

    # hoist jaxpr constvars into explicit kernel inputs (Pallas kernels
    # may not capture array constants — see ops/megastep.py)
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
    def pallas_jac(x_T: jax.Array, u_T: jax.Array):
        B = x_T.shape[-1]
        pad = (-B) % block_b
        if pad:
            x_T = jnp.concatenate(
                [x_T, jnp.tile(x_T[:, -1:], (1, pad))], -1)
            u_T = jnp.concatenate(
                [u_T, jnp.tile(u_T[:, -1:], (1, pad))], -1)
        Bp = B + pad
        grid = (Bp // block_b,)
        rep = [pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for c in consts2d]
        fx, fu = pl.pallas_call(
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
                jax.ShapeDtypeStruct((n, n, Bp), x_T.dtype),
                jax.ShapeDtypeStruct((n, m, Bp), x_T.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x_T, u_T, *consts2d)
        if pad:
            fx, fu = fx[..., :B], fu[..., :B]
        return fx, fu

    return pallas_jac


def pallas_jac_for_system(system, block_b: int = 128,
                          interpret: bool = False):
    """Build the kernel from a multibody DiscreteSystem, matching its
    lane step's build options (recorded by plant.make_multibody_system).
    Returns None when the system has no structured-IFT lane jac."""
    if system.lane_jac_fn is None:
        return None
    try:
        model, contact = system.params
    except (TypeError, ValueError):
        return None
    if not hasattr(model, "nq"):
        return None
    lane = system.lane_step_fn
    if lane is None:
        return None
    return make_pallas_jac(
        model, contact, system.dt,
        contact_iters=getattr(lane, "contact_iters", 2),
        force_params=getattr(lane, "force_params", ContactForceParams()),
        block_b=block_b, interpret=interpret)
