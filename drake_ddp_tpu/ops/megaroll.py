"""Pallas mega-rollout kernel: the WHOLE closed-loop linesearch rollout
as one VMEM-resident program.

The per-step mega-kernel (ops/megastep.py) already keeps each contact
step in VMEM, but a linesearch rollout still launches it N-1 times from
a ``lax.scan``: every step round-trips the state through HBM, re-DMAs
the replicated model constants, and pays a kernel dispatch.  This kernel
fuses the scan *inside* the Pallas program: the gain/feedforward tapes
(u_bar, kappa, K, x_bar) for the full horizon live in VMEM next to the
state, the time loop is a ``fori_loop`` over the same step body
(multibody/lanestep.py, hoisted-jaxpr trick as megastep.py), and the
only HBM traffic is the initial tape load and the trajectory store.

The closed-loop policy matches solver/batched._chunk_rollout_lanes and
the reference linesearch rollout (reference ilqr.py:312-316):

    u_t = u_bar_t - eps * kappa_t - K_t (x_t - x_bar_t)

VMEM budget per tile (flagship: n=37, m=12, N=50, block_b=128): the K
tape would be ~12 MB against the ~16 MB/core budget, so it stays whole
in HBM and the per-step (m, n_pad, block_b) slice is double-buffered in
(the t+1 DMA overlaps the step-t contact solve).  The remaining tapes
(u_bar/kappa/x_bar ~2 MB) + trajectory outputs (~1.4 MB) + step working
set (~6 MB) live in VMEM.

Mosaic tiling-legality constraints (f32 memrefs are (8, 128)-tiled on
the last two dims; violating either fails *hardware* compilation while
interpret mode passes — exactly the r02 regression, BENCH_r02.json):

- block_b must be a multiple of 128 (lane tile) — it is both the DMA
  slice size and offset stride of K's minor dim.  Padding a small batch
  up to 128 lanes costs nothing extra: the VPU processes 8x128-lane
  registers regardless, so sub-128 batches burn the same cycles either
  way.
- every manually-DMA'd slice of the K tape must be tile-aligned on the
  last two dims: its n (second-minor) extent is therefore padded
  host-side to a multiple of 8 (zeros; the kernel slices the VMEM
  buffer back to n).  r02 shipped the unpadded n=37 slice and died with
  "Slice shape along dimension 2 must be aligned to tiling (8)".

Both constraints are asserted at build time (``_assert_k_dma_legal``)
so an illegal configuration fails in CI, not on the flagship bench.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drake_ddp_tpu.contact.forces import ContactForceParams
from drake_ddp_tpu.multibody.lanestep import make_lane_step

# f32 memref tile on TPU: (sublane, lane) = (8, 128) over the last two dims
_SUBLANE, _LANE = 8, 128


def _assert_k_dma_legal(T, m_in, n_pad, block_b, interpret):
    """Static Mosaic-legality check for the K-tape HBM DMA.

    The kernel slices ``K_hbm[t, :, :, col0:col0+block_b]`` out of a
    (T, m_in, n_pad, B) f32 HBM memref.  Mosaic requires the slice's
    extent and offset on each of the two tiled (trailing) dims to be
    tile-aligned.  Checked here at build time so that a violation fails
    unit tests / kernel construction instead of the flagship bench
    (the r02 failure mode).  Interpret mode is exempt from the lane
    constraint (CPU interpret honors any block_b; tests use 8) but NOT
    from the sublane one, so shape regressions still surface in CI.
    """
    if n_pad % _SUBLANE != 0:
        raise ValueError(
            f"K DMA slice second-minor extent {n_pad} not a multiple of "
            f"the f32 sublane tile {_SUBLANE}; pad the n dim host-side")
    if not interpret and block_b % _LANE != 0:
        raise ValueError(
            f"block_b={block_b} must be a multiple of the lane tile "
            f"{_LANE} on hardware: it is the K DMA slice extent and "
            f"offset stride on the minor dim")


def make_pallas_rollout(
    model,
    contact,
    dt: float,
    num_steps: int,
    contact_iters: int = 2,
    force_params: ContactForceParams = ContactForceParams(),
    block_b: int = 128,
    interpret: bool = False,
) -> Callable:
    """Build the fused rollout:

        (x0 (n, B), eps (B,), u_bar (N-1, m, B), kappa (N-1, m, B),
         K (N-1, m, n, B), x_bar (N-1, n, B)) -> (xs (N-1, n, B),
                                                  us (N-1, m, B))

    ``xs[t]`` is the state AFTER step t (x0 is not repeated).  Any B is
    accepted: the wrapper zero-pads the batch up to a multiple of
    ``block_b`` and slices the outputs back (dead lanes are free on the
    VPU — see module docstring).
    """
    n = model.nq + model.nv
    m = model.nu
    T = num_steps - 1
    # K's n extent is padded to the f32 sublane tile so the per-step HBM
    # DMA slice is Mosaic tiling-legal (see module docstring / r02 bug)
    n_pad = -(-n // _SUBLANE) * _SUBLANE
    step_T = make_lane_step(model, contact, dt,
                            contact_iters=contact_iters,
                            force_params=force_params)
    m_in = max(m, 1)

    # hoist the step jaxpr's constvars into explicit replicated inputs
    # (Pallas kernels may not capture array constants — see megastep.py)
    x_spec = jax.ShapeDtypeStruct((n, block_b), jnp.float32)
    u_spec = jax.ShapeDtypeStruct((m_in, block_b), jnp.float32)
    cjaxpr = jax.make_jaxpr(
        lambda xx, uu: step_T(xx, uu if m else uu[:0]))(x_spec, u_spec)
    consts = cjaxpr.consts

    def closed_step(xx, uu, cs):
        (out,) = jax.core.eval_jaxpr(cjaxpr.jaxpr, cs, xx, uu)
        return out

    const_shapes = [c.shape for c in consts]
    consts2d = [jnp.asarray(c).reshape(1, -1) if c.ndim < 2 else
                jnp.asarray(c) for c in consts]

    def kernel(x0_ref, eps_ref, ub_ref, kap_ref, K_hbm, xb_ref,
               *refs):
        const_refs = refs[:-2]
        xs_ref, us_ref = refs[-2:]
        cs = [r[:].reshape(s) for r, s in zip(const_refs, const_shapes)]
        eps = eps_ref[0]                                  # (block_b,)
        col0 = pl.program_id(0) * block_b

        # The K tape is the one VMEM-budget breaker ((T, m, n, blk) f32
        # at the flagship is ~12 MB against the ~16 MB/core budget), so
        # it stays whole in HBM (memory_space ANY) and the per-step
        # (m, n, blk) slice is double-buffered in: the t+1 DMA overlaps
        # the step-t contact solve.
        def scoped(kbuf, ksem):
            def k_dma(slot, t):
                return pltpu.make_async_copy(
                    K_hbm.at[t, :, :, pl.ds(col0, block_b)],
                    kbuf.at[slot], ksem.at[slot])

            k_dma(0, 0).start()

            def body(t, x):
                slot = jax.lax.rem(t, 2)

                @pl.when(t + 1 < T)
                def _():
                    k_dma(jax.lax.rem(t + 1, 2), t + 1).start()

                k_dma(slot, t).wait()
                ub = ub_ref[t]                            # (m_in, blk)
                kap = kap_ref[t]
                xb = xb_ref[t]                            # (n, blk)
                dx = x - xb
                # kbuf is (m_in, n_pad, blk); drop the zero-padded tail
                # of the n dim (value-level slice — tile-legal)
                Kdx = jnp.sum(kbuf[slot][:, :n, :] * dx[None], axis=1)
                u = ub - eps[None] * kap - Kdx            # (m_in, blk)
                # the traced jaxpr takes the (m_in, blk) input and
                # slices to zero width internally when m == 0
                x_next = closed_step(x, u, cs)
                xs_ref[t] = x_next
                us_ref[t] = u
                return x_next

            jax.lax.fori_loop(0, T, body, x0_ref[:])

        pl.run_scoped(
            scoped,
            kbuf=pltpu.VMEM((2, m_in, n_pad, block_b), jnp.float32),
            ksem=pltpu.SemaphoreType.DMA((2,)))

    _assert_k_dma_legal(T, m_in, n_pad, block_b, interpret)

    @jax.jit
    def rollout(x0, eps, u_bar, kappa, K, x_bar):
        B0 = x0.shape[-1]
        pad = (-B0) % block_b
        if pad:
            padz = lambda a: jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1)
            x0, eps, u_bar, kappa, K, x_bar = map(
                padz, (x0, eps, u_bar, kappa, K, x_bar))
        B = x0.shape[-1]
        if not m:  # zero-width blocks are not representable
            z = jnp.zeros((T, 1, B), x0.dtype)
            u_bar, kappa = z, z
            K = jnp.zeros((T, 1, n, B), x0.dtype)
        if n_pad != n:
            # zero-pad K's n dim to the sublane tile: keeps the manual
            # HBM DMA slice tile-aligned (the kernel reads back [:, :n])
            K = jnp.concatenate(
                [K, jnp.zeros(K.shape[:2] + (n_pad - n, B), K.dtype)],
                axis=2)
        grid = (B // block_b,)
        rep = [pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for c in consts2d]
        tile = lambda shape: pl.BlockSpec(
            shape, lambda i: (0,) * (len(shape) - 1) + (i,),
            memory_space=pltpu.VMEM)
        xs, us = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                tile((n, block_b)),
                tile((1, block_b)),
                tile((T, m_in, block_b)),
                tile((T, m_in, block_b)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # K stays in HBM
                tile((T, n, block_b)),
            ] + rep,
            out_specs=(tile((T, n, block_b)), tile((T, m_in, block_b))),
            out_shape=(
                jax.ShapeDtypeStruct((T, n, B), x0.dtype),
                jax.ShapeDtypeStruct((T, m_in, B), x0.dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x0, eps.reshape(1, B), u_bar, kappa, K, x_bar, *consts2d)
        return xs[..., :B0], us[:, :m, :B0]

    return rollout


def pallas_rollout_for_system(system, num_steps: int, block_b: int = 128,
                              interpret: bool = False):
    """Build the fused rollout from a multibody DiscreteSystem (None for
    systems without one)."""
    try:
        model, contact = system.params
    except (TypeError, ValueError):
        return None
    if not hasattr(model, "nq"):
        return None
    lane = system.lane_step_fn
    if lane is None:
        return None
    return make_pallas_rollout(
        model, contact, system.dt, num_steps,
        contact_iters=getattr(lane, "contact_iters", 2),
        force_params=getattr(lane, "force_params", ContactForceParams()),
        block_b=block_b, interpret=interpret)
