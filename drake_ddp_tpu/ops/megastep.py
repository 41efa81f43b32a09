"""Pallas mega-step kernel: one VMEM-resident multibody contact step.

The XLA-compiled rollout spends most of its time moving data, not
computing: the device trace of the flagship rollout shows layout-shuffle
copies of the (B, NC, 3, nv) contact-Jacobian tensors, f32<->bf16
conversions around small dots, and async DMA slice traffic from the
unrolled linear solves — the step runs at ~0.01% of VPU peak.

This kernel runs the ENTIRE step (forward kinematics, mass matrix, bias,
narrowphase, contact Jacobians, implicit Newton contact solve, position
integration) as one Pallas program per batch tile, with every
intermediate living in VMEM in a lane-major layout.  The body is the
*same code* as multibody/lanestep.py — written there as pure elementwise
ops over static unrolls (no einsum/dot_general, no gathers), which is
exactly the subset Mosaic compiles well — so the kernel inherits the
lanestep equivalence tests.

Grid: one program per tile of ``block_b`` scenarios (grid dim is
embarrassingly parallel).  VMEM footprint per tile at the flagship sizes
(nv=18, NC=44, block_b=128) is ~6 MB — comfortably under the ~16 MB/core
budget; shrink ``block_b`` for bigger scenes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.multibody.lanestep import make_lane_step


def make_pallas_step(
    model,
    contact,
    dt: float,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
    block_b: int = 128,
    interpret: bool = False,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build a lane-major step (x_T (n, B), u_T (m, B)) -> (n, B) that runs
    as a single Pallas kernel per batch tile.  B must be a multiple of
    ``block_b`` (pad the batch; lanes are independent)."""
    n = model.nq + model.nv
    m = model.nu
    step_T = make_lane_step(model, contact, dt,
                            contact_iters=contact_iters,
                            force_params=force_params)

    m_in = max(m, 1)  # zero-width blocks are not representable

    # Pallas kernels may not capture array constants (model data, contact
    # pair tables, eye/zero temps).  Trace the step once and hoist the
    # jaxpr's constvars into an explicit argument list, which we feed to
    # the kernel as replicated VMEM inputs (same block every grid step).
    x_spec = jax.ShapeDtypeStruct((n, block_b), jnp.float32)
    u_spec = jax.ShapeDtypeStruct((m_in, block_b), jnp.float32)
    cjaxpr = jax.make_jaxpr(
        lambda xx, uu: step_T(xx, uu if m else uu[:0]))(x_spec, u_spec)
    consts = cjaxpr.consts

    def closed(xx, uu, *cs):
        (out,) = jax.core.eval_jaxpr(cjaxpr.jaxpr, cs, xx, uu)
        return out
    # ship every const as a >=2D array (Mosaic-friendly VMEM blocks)
    const_shapes = [c.shape for c in consts]
    consts2d = [jnp.asarray(c).reshape(1, -1) if c.ndim < 2 else
                jnp.asarray(c) for c in consts]

    def kernel(x_ref, u_ref, *refs):
        const_refs, out_ref = refs[:-1], refs[-1]
        cs = [r[:].reshape(s) for r, s in zip(const_refs, const_shapes)]
        out_ref[:] = closed(x_ref[:], u_ref[:], *cs)

    @jax.jit
    def pallas_step(x_T: jax.Array, u_T: jax.Array) -> jax.Array:
        B = x_T.shape[-1]
        if B % block_b != 0:
            raise ValueError(f"batch {B} not a multiple of {block_b}")
        u_in = u_T if m else jnp.zeros((1, B), x_T.dtype)
        grid = (B // block_b,)
        rep = [pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for c in consts2d]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_in, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + rep,
            out_specs=pl.BlockSpec((n, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, B), x_T.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x_T, u_in, *consts2d)

    return pallas_step


def pallas_step_for_system(system, block_b: int = 128,
                           interpret: bool = False):
    """Convenience: build the kernel from a multibody DiscreteSystem
    (as produced by plant.make_multibody_system).  Returns None for
    systems without a multibody params tuple."""
    try:
        model, contact = system.params
    except (TypeError, ValueError):
        return None
    if not hasattr(model, "nq"):
        return None
    # the build options are recorded on lane_step_fn by
    # plant.make_multibody_system so the kernel matches the system exactly
    lane = system.lane_step_fn
    if lane is None:
        return None
    return make_pallas_step(
        model, contact, system.dt,
        contact_iters=getattr(lane, "contact_iters", 2),
        force_params=getattr(lane, "force_params", ContactForceParams()),
        block_b=block_b, interpret=interpret)
