"""Sharded scenario batching on the virtual 8-device CPU mesh
(SURVEY.md §2.4: DP over scenarios is the TPU scaling axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drake_ddp_tpu.dynamics.analytic import cart_pole_system
from drake_ddp_tpu.mpc.driver import MPCConfig
from drake_ddp_tpu.parallel import batched_mpc, batched_solve, scenario_mesh
from drake_ddp_tpu.solver.ilqr import ILQRConfig, ILQRProblem, solve_ilqr


def _make_probs(batch, N, seed=0):
    rng = np.random.default_rng(seed)
    x0 = np.zeros((batch, 4), np.float32)
    x0[:, 1] = np.pi + 0.2 * rng.standard_normal(batch)
    tile = lambda a: np.tile(np.asarray(a, np.float32), (batch, 1, 1))
    return ILQRProblem(
        x0=jnp.asarray(x0),
        x_nom=jnp.tile(jnp.array([0, np.pi, 0, 0], jnp.float32), (batch, 1)),
        Q=jnp.asarray(tile(0.01 * np.eye(4))),
        R=jnp.asarray(tile(0.001 * np.eye(1))),
        Qf=jnp.asarray(tile(10 * np.eye(4))),
        u_init=jnp.zeros((batch, N - 1, 1), jnp.float32),
    )


def test_mesh_has_8_devices():
    mesh = scenario_mesh()
    assert mesh.devices.size == 8


def test_batched_solve_matches_single():
    N = 12
    sys = cart_pole_system(dt=1e-2)
    cfg = ILQRConfig(num_steps=N, max_iters=4, beta=0.5)
    probs = _make_probs(16, N)
    sols, stats = batched_solve(sys, cfg, probs)
    assert sols.cost.shape == (16,)
    assert np.isfinite(float(stats.mean_cost))
    assert float(stats.mean_cost) == pytest.approx(
        float(jnp.mean(sols.cost)), rel=1e-5)
    # scenario 3 must equal the unsharded single solve
    single = jax.jit(lambda p: solve_ilqr(sys, cfg, p))(
        jax.tree_util.tree_map(lambda x: x[3], probs))
    assert float(single.cost) == pytest.approx(float(sols.cost[3]), rel=1e-4)
    assert int(stats.total_iterations) == int(jnp.sum(sols.iterations))


def test_batched_solve_rejects_ragged_batch():
    sys = cart_pole_system(dt=1e-2)
    cfg = ILQRConfig(num_steps=8, max_iters=2)
    with pytest.raises(ValueError, match="divide"):
        batched_solve(sys, cfg, _make_probs(9, 8))


def test_batched_mpc_runs():
    N = 10
    sys = cart_pole_system(dt=1e-2)
    cfg = ILQRConfig(num_steps=N, max_iters=3, beta=0.5)
    probs = _make_probs(8, N)
    res, stats = batched_mpc(sys, cfg, probs, MPCConfig(num_resolves=2,
                                                        replan_steps=2))
    # stitched trajectory: N + resolves*replan steps per scenario
    assert res.states.shape == (8, N + 4, 4)
    assert res.costs.shape == (8, 3)
    assert np.isfinite(float(stats.mean_cost))
