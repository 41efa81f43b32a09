"""Sharded scenario batching: one compiled program, many solves.

Design (jax-ml.github.io/scaling-book recipe): pick a 1-D ``scenario``
mesh over all devices, shard every problem-pytree leaf on its leading
(batch) axis, and run the *whole* iLQR/MPC solve inside ``shard_map`` —
each device executes its own ``vmap`` over its local shard, so one slow
scenario's convergence loop only serializes its own device, not the
pod.  Cross-device reductions (mean cost, divergence counts) are
explicit ``psum`` collectives riding ICI.

The reference has no distributed story at all (SURVEY.md §2.4); this
module is the TPU-native replacement for "run the script N times".
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.mpc.driver import MPCConfig, MPCResult, mpc_solve_batched
from drake_ddp_tpu.solver.batched import solve_ilqr_batched
from drake_ddp_tpu.solver.ilqr import (
    ILQRConfig,
    ILQRProblem,
    ILQRSolution,
)

AXIS = "scenario"


def scenario_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(AXIS,))


def shard_problems(mesh: Mesh, probs: ILQRProblem) -> ILQRProblem:
    """Place a batched problem pytree (leading axis = scenario) on the
    mesh, sharded over scenarios (over ALL mesh axes for >=2-D meshes,
    e.g. the multihost (host, device) mesh)."""
    sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), probs
    )


class BatchStats(NamedTuple):
    """Cross-device summary (psum-reduced, replicated on every device)."""

    mean_cost: jax.Array        # scalar
    num_diverged: jax.Array     # int32 scalar
    total_iterations: jax.Array # int32 scalar


def batched_solve(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    probs: ILQRProblem,
    mesh: Optional[Mesh] = None,
    donate: bool = False,
):
    """Solve a scenario batch, sharded over the mesh.

    Args:
        system, cfg: static solve setup (compiled once).
        probs: ILQRProblem with a leading batch axis on every leaf; the
            batch must divide the mesh size.
        mesh: scenario mesh (default: all devices).
    Returns:
        (solutions, stats): ILQRSolution batched on axis 0 (sharded),
        and replicated BatchStats.
    """
    mesh = mesh or scenario_mesh()
    axes = tuple(mesh.axis_names)
    nd = mesh.devices.size
    batch = jax.tree_util.tree_leaves(probs)[0].shape[0]
    if batch % nd:
        raise ValueError(f"batch {batch} must divide mesh size {nd}")

    def local_solve(p: ILQRProblem):
        # each device runs the natively-batched solver (lane-major /
        # Pallas rollout, structured-IFT derivatives) over its own shard
        sol = solve_ilqr_batched(system, cfg, p)
        stats = BatchStats(
            mean_cost=jax.lax.psum(jnp.sum(sol.cost), axes) / batch,
            num_diverged=jax.lax.psum(
                jnp.sum(sol.diverged.astype(jnp.int32)), axes),
            total_iterations=jax.lax.psum(jnp.sum(sol.iterations), axes),
        )
        return sol, stats

    shard = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=(P(axes), P()),
    )
    fn = jax.jit(shard, donate_argnums=(0,) if donate else ())
    return fn(shard_problems(mesh, probs))


def batched_mpc(
    system: DiscreteSystem,
    cfg: ILQRConfig,
    probs: ILQRProblem,
    mpc: MPCConfig,
    x_nom_shift: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
):
    """Receding-horizon MPC over a sharded scenario batch: the full
    resolve loop (initial solve + ``mpc.num_resolves`` warm-started
    resolves) runs on-device per scenario; one compiled call returns
    every stitched trajectory.

    This is the BASELINE.json north-star shape: thousands of
    mini-cheetah-class MPC runs per second across a pod slice.
    """
    mesh = mesh or scenario_mesh()
    axes = tuple(mesh.axis_names)
    nd = mesh.devices.size
    batch = jax.tree_util.tree_leaves(probs)[0].shape[0]
    if batch % nd:
        raise ValueError(f"batch {batch} must divide mesh size {nd}")

    def local_mpc(p: ILQRProblem) -> tuple:
        # per-device natively-batched MPC chain (solver/batched.py) —
        # the same fast path bench.py measures single-chip
        res = mpc_solve_batched(system, cfg, p, mpc, x_nom_shift)
        stats = BatchStats(
            mean_cost=jax.lax.psum(jnp.sum(res.costs[:, -1]), axes) / batch,
            num_diverged=jax.lax.psum(
                jnp.sum(res.diverged.astype(jnp.int32)), axes),
            total_iterations=jax.lax.psum(jnp.sum(res.iterations), axes),
        )
        return res, stats

    shard = jax.shard_map(
        local_mpc,
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=(P(axes), P()),
    )
    return jax.jit(shard)(shard_problems(mesh, probs))
