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
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
