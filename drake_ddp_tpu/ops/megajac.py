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

Round-5 hardware facts (tools/probe_megajac_sweep.py, v5e):

- The round-4 kernel (vmapped q-tangents) NEVER compiled on the real
  chip: nq live copies of the kinematics/narrowphase tangent
  intermediates blow VMEM and Mosaic dies (the bench fell back to the
  lane path).  The fix is lanejac's ``q_mode="loop"`` — linearize the
  residual once, walk tangent directions in a fori_loop.
- Measured at the flagship derivative-call size (1792 lanes, ci=8):
  lane XLA jac 34.7 ms, this kernel 7.5 ms — **4.6x** (q_group=1,
  block_b=128; q_group=2 is slightly slower, block_b=256 and
  q_group=4 exceed VMEM and fail compile).
- Tile size: Mosaic requires the out-block's last dim divisible by 128
  (the (n, n, block_b) 3D blocks put block_b last), so ``block_b=128``
  is the minimum — and also the only legal — tile at flagship sizes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.multibody.lanejac import make_lane_jac

# Build-time VMEM budget for the kernel body's estimated peak liveness.
# The real v5e VMEM is 128 MiB shared with Mosaic's own double
# buffering and tile padding; the estimator below underestimates the
# compiler's true footprint (no scheduling slack, no spill buffers), so
# the budget is calibrated against hardware measurements
# (tools/probe_megajac_sweep.py): flagship (128, q_group=1) compiles
# and must pass (estimator: 66.7 MiB), as does (128, q_group=2)
# (73.4 MiB); (128, q_group=4) (91.1 MiB), (256, q_group=1)
# (113.4 MiB) and the round-4 vmapped-q build (186 MiB) all die in
# Mosaic and must fail here at build time.
VMEM_BUDGET_BYTES = 80 * 1024 * 1024


class MegajacVmemError(ValueError):
    """Estimated kernel VMEM footprint exceeds the legality budget."""


def _tile_bytes(aval) -> int:
    """Mosaic-padded buffer size: last dim to 128 lanes, second-to-last
    to 8 sublanes (f32)."""
    shape = getattr(aval, "shape", ())
    if not shape:
        return 8
    s = list(shape)
    s[-1] = -(-s[-1] // 128) * 128
    if len(s) >= 2:
        s[-2] = -(-s[-2] // 8) * 8
    itemsize = np.dtype(getattr(aval, "dtype", np.float32)).itemsize
    return int(np.prod(s)) * itemsize


def _peak_live_bytes(jaxpr) -> int:
    """Peak sum of live (tile-padded) array bytes over a jaxpr's
    straight-line schedule; control-flow sub-jaxprs contribute carry +
    their own inner peak.  A coarse lower bound on Mosaic's VMEM need —
    good enough to catch order-of-magnitude blow-ups (the vmapped
    q-tangent group) before the hardware compiler does."""
    from jax._src.core import Var

    last_use: dict = {}
    for i, eqn in enumerate(jaxpr.eqns):
        for v in eqn.invars:
            if isinstance(v, Var):
                last_use[v] = i
    for v in jaxpr.outvars:
        if isinstance(v, Var):
            last_use[v] = len(jaxpr.eqns)

    live = sum(_tile_bytes(v.aval) for v in
               list(jaxpr.invars) + list(jaxpr.constvars))
    peak = live
    for i, eqn in enumerate(jaxpr.eqns):
        inner = 0
        for sub in eqn.params.values():
            cj = getattr(sub, "jaxpr", None)
            if cj is not None and hasattr(cj, "eqns"):
                inner = max(inner, _peak_live_bytes(cj))
        for v in eqn.outvars:
            if isinstance(v, Var):
                live += _tile_bytes(v.aval)
        peak = max(peak, live + inner)
        for v in set(x for x in eqn.invars if isinstance(x, Var)):
            if last_use.get(v) == i:
                live -= _tile_bytes(v.aval)
        for v in eqn.outvars:
            if isinstance(v, Var) and last_use.get(v, -1) <= i:
                live -= _tile_bytes(v.aval)
    return peak


def make_pallas_jac(
    model,
    contact,
    dt: float,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
    block_b: int = 128,
    q_group: int = 1,
    root_seed: bool = False,
    refine_iters: int = 0,
    interpret: bool = False,
) -> Optional[Callable[..., tuple[jax.Array, jax.Array]]]:
    """Build a lane-major Jacobian kernel (x_T (n, B), u_T (m, B)) ->
    (fx (n, n, B), fu (n, m, B)) running as one Pallas program per
    ``block_b`` lane tile.  B is padded internally to a tile multiple
    (lanes are independent).  Returns None for unactuated models.

    ``root_seed``: the kernel takes a third input x_next_T (n, B) and
    skips the internal contact Newton (see lanejac.make_lane_jac)."""
    n = model.nq + model.nv
    m = model.nu
    if m == 0:
        return None   # fu would need a zero-width block
    # q_mode="loop": the vmapped q-tangent group holds nq live copies of
    # the kinematics/narrowphase tangent intermediates — a VMEM blow-up
    # that killed Mosaic compilation at flagship sizes (round-4 bench
    # fell back to the lane path).  The loop form linearizes once and
    # walks directions sequentially; only one direction is live at a
    # time and the kernel compiles (tools/probe_megajac_compile.py).
    jac_T = make_lane_jac(model, contact, dt,
                          contact_iters=contact_iters,
                          force_params=force_params,
                          q_mode="loop", q_group=q_group,
                          root_seed=root_seed,
                          refine_iters=refine_iters)
    n_in = 3 if root_seed else 2

    # hoist jaxpr constvars into explicit kernel inputs (Pallas kernels
    # may not capture array constants — see ops/megastep.py)
    x_spec = jax.ShapeDtypeStruct((n, block_b), jnp.float32)
    u_spec = jax.ShapeDtypeStruct((m, block_b), jnp.float32)
    args = ((x_spec, u_spec, x_spec) if root_seed
            else (x_spec, u_spec))
    cjaxpr = jax.make_jaxpr(jac_T)(*args)
    consts = cjaxpr.consts

    if not interpret:
        # Mosaic-legality gate: estimate the kernel body's peak VMEM
        # liveness at build time so an illegal tiling fails in CI, not
        # silently at bench time (the round-4 regression class:
        # BENCH_r04 deriv_fallback_reason).  Interpret mode has no VMEM.
        est = (_peak_live_bytes(cjaxpr.jaxpr)
               + 2 * (_tile_bytes(jax.ShapeDtypeStruct(
                   (n, n, block_b), jnp.float32))
                      + _tile_bytes(jax.ShapeDtypeStruct(
                          (n, m, block_b), jnp.float32))))
        if est > VMEM_BUDGET_BYTES:
            raise MegajacVmemError(
                f"megajac estimated VMEM {est / 2**20:.1f} MiB exceeds "
                f"budget {VMEM_BUDGET_BYTES / 2**20:.0f} MiB "
                f"(block_b={block_b}, q_group={q_group}); Mosaic would "
                "die at hardware-compile time — shrink the tile")

    def closed(ins, *cs):
        fx, fu = jax.core.eval_jaxpr(cjaxpr.jaxpr, cs, *ins)
        return fx, fu

    const_shapes = [c.shape for c in consts]
    consts2d = [jnp.asarray(c).reshape(1, -1) if c.ndim < 2 else
                jnp.asarray(c) for c in consts]

    def kernel(*refs):
        in_refs = refs[:n_in]
        const_refs = refs[n_in:-2]
        fx_ref, fu_ref = refs[-2:]
        cs = [r[:].reshape(s) for r, s in zip(const_refs, const_shapes)]
        fx, fu = closed([r[:] for r in in_refs], *cs)
        fx_ref[:] = fx
        fu_ref[:] = fu

    @jax.jit
    def pallas_jac(x_T: jax.Array, u_T: jax.Array, xn_T=None):
        B = x_T.shape[-1]
        pad = (-B) % block_b
        ins = [x_T, u_T] + ([xn_T] if root_seed else [])
        if pad:
            ins = [jnp.concatenate([a, jnp.tile(a[:, -1:], (1, pad))], -1)
                   for a in ins]
        Bp = B + pad
        grid = (Bp // block_b,)
        in_dims = [n, m] + ([n] if root_seed else [])
        rep = [pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for c in consts2d]
        fx, fu = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((d, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM) for d in in_dims
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
        )(*ins, *consts2d)
        if pad:
            fx, fu = fx[..., :B], fu[..., :B]
        return fx, fu

    if root_seed:
        return lambda x_T, u_T, xn_T: pallas_jac(x_T, u_T, xn_T)
    return lambda x_T, u_T: pallas_jac(x_T, u_T)


def pallas_jac_for_system(system, block_b: int = 128,
                          q_group: int = 1,
                          root_seed: bool = False,
                          refine_iters: int = 0,
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
        block_b=block_b, q_group=q_group, root_seed=root_seed,
        refine_iters=refine_iters, interpret=interpret)
