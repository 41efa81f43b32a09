"""Auxiliary subsystems (SURVEY.md §5): timing, checkpoint/resume."""

import time

import jax.numpy as jnp
import numpy as np

from drake_ddp_tpu.io.checkpoint import (
    load_mpc_checkpoint,
    save_mpc_checkpoint,
)
from drake_ddp_tpu.solver.ilqr import ILQRProblem
from drake_ddp_tpu.utils.profiling import phase_timer


def test_phase_timer():
    t = phase_timer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        pass
    with t("b"):
        pass
    rep = t.report()
    assert rep["a"] >= 0.01
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.pretty()


def test_mpc_checkpoint_roundtrip(tmp_path):
    B, N, n, m = 4, 10, 6, 2
    rng = np.random.default_rng(0)
    prob = ILQRProblem(
        x0=jnp.asarray(rng.normal(size=(B, n)), jnp.float32),
        x_nom=jnp.asarray(rng.normal(size=(B, n)), jnp.float32),
        Q=jnp.tile(jnp.eye(n, dtype=jnp.float32), (B, 1, 1)),
        R=jnp.tile(jnp.eye(m, dtype=jnp.float32), (B, 1, 1)),
        Qf=jnp.tile(jnp.eye(n, dtype=jnp.float32), (B, 1, 1)),
        u_init=jnp.asarray(rng.normal(size=(B, N - 1, m)), jnp.float32),
    )
    path = str(tmp_path / "ckpt.npz")
    save_mpc_checkpoint(path, prob, resolves_done=37,
                        extra={"costs": np.ones(B)})
    prob2, done, extras = load_mpc_checkpoint(path)
    assert done == 37
    assert np.allclose(extras["costs"], 1.0)
    for a, b in zip(prob, prob2):
        if a is None:
            assert b is None     # optional fields stay at their default
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # populated optional policy-warm-start fields roundtrip too
    prob_ws = prob._replace(
        K_init=jnp.asarray(rng.normal(size=(B, N - 1, m, n)), jnp.float32),
        x_ref_init=jnp.asarray(rng.normal(size=(B, N, n)), jnp.float32),
        frozen=jnp.zeros(B, bool),
    )
    path2 = str(tmp_path / "ckpt_ws.npz")
    save_mpc_checkpoint(path2, prob_ws, resolves_done=38)
    prob3, done3, _ = load_mpc_checkpoint(path2)
    assert done3 == 38
    for a, b in zip(prob_ws, prob3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_profiled_solve_matches_fused():
    """The per-phase-timed host-stepped solve (solver/profile.py — the
    reference's time_fp/time_getDerivs/time_bp columns, ilqr.py:685-704)
    is semantically identical to the fused solve_ilqr."""
    import jax

    from drake_ddp_tpu.dynamics import pendulum_system
    from drake_ddp_tpu.solver.ilqr import ILQRConfig, solve_ilqr
    from drake_ddp_tpu.solver.profile import (
        format_phase_table,
        profiled_solve,
    )

    dt, N = 1e-2, 80
    sys_ = pendulum_system(dt=dt)
    cfg = ILQRConfig(num_steps=N, max_iters=10)
    prob = ILQRProblem(
        x0=jnp.zeros(2, jnp.float32),
        x_nom=jnp.asarray([np.pi, 0.0], jnp.float32),
        Q=jnp.asarray(dt * 0.01 * np.diag([0, 1.0]), jnp.float32),
        R=jnp.asarray(dt * 0.01 * np.eye(1), jnp.float32),
        Qf=jnp.asarray(100 * np.eye(2), jnp.float32),
        u_init=jnp.zeros((N - 1, 1), jnp.float32),
    )
    ref = jax.jit(lambda p: solve_ilqr(sys_, cfg, p))(prob)
    sol, times = profiled_solve(sys_, cfg, prob)
    assert int(ref.iterations) == int(sol.iterations)
    np.testing.assert_allclose(float(ref.cost), float(sol.cost), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(sol.u),
                               atol=1e-5)
    # one timing entry per phase per iteration, all nonnegative
    assert len(times.forward) == int(sol.iterations)
    assert len(times.backward) == int(sol.iterations)
    assert all(t >= 0 for t in times.forward + times.derivs + times.backward)
    table = format_phase_table(sol, times)
    assert "time_fp" in table and "time_derivs" in table
    assert "phase totals" in table


def test_profiled_solve_batched_matches_fused():
    """The batched per-phase profiler (solver/profile.py — used to
    attribute iteration time at production batch on TPU) matches the
    fused batched solver exactly on the wall task."""
    import jax

    from drake_ddp_tpu.examples import cart_pole_with_wall as ex
    from drake_ddp_tpu.solver.batched import solve_ilqr_batched
    from drake_ddp_tpu.solver.ilqr import ILQRConfig
    from drake_ddp_tpu.solver.profile import profiled_solve_batched

    system = ex.build_system(ex.Config())
    N, B = 40, 4
    dt = 1e-2
    rng = np.random.default_rng(0)
    x0b = np.tile([0.0, np.pi + 0.5, 0.0, 0.0], (B, 1)).astype(np.float32)
    x0b += 0.01 * rng.standard_normal(x0b.shape).astype(np.float32)
    tile = lambda a: jnp.tile(jnp.asarray(a, jnp.float32)[None],
                              (B, 1, 1))
    prob = ILQRProblem(
        x0=jnp.asarray(x0b),
        x_nom=jnp.tile(jnp.asarray([0.0, np.pi, 0.0, 0.0], jnp.float32),
                       (B, 1)),
        Q=tile(dt * np.diag([0.1, 1.0, 0.01, 0.01])),
        R=tile(dt * 0.001 * np.eye(1)),
        Qf=tile(np.diag([200.0, 200.0, 10.0, 10.0])),
        u_init=jnp.zeros((B, N - 1, 1), jnp.float32),
    )
    cfg = ILQRConfig(num_steps=N, beta=0.5, max_iters=8)
    ref = jax.jit(lambda p: solve_ilqr_batched(system, cfg, p))(prob)
    sol, times = profiled_solve_batched(system, cfg, prob)
    np.testing.assert_array_equal(np.asarray(ref.iterations),
                                  np.asarray(sol.iterations))
    np.testing.assert_allclose(np.asarray(ref.cost),
                               np.asarray(sol.cost), rtol=1e-4)
    maxit = int(np.asarray(sol.iterations).max())
    assert len(times.forward) == maxit
    assert len(times.derivs) == maxit
    assert len(times.backward) == maxit
