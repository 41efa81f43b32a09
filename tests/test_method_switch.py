"""The reference's iLQR/SQP method switch (pendulum.py:23,109-141) and
the save/replay path (kinova_gen3.py:284,292-311)."""

import numpy as np
import pytest


def test_pendulum_sqp_method():
    from drake_ddp_tpu.examples import pendulum as ex

    states, inputs, t, cost = ex.run(ex.Config(method="sqp", verbose=False))
    assert states.shape[0] == 2
    # swing-up reached via the transcription baseline
    assert abs(states[0, -1] - np.pi) < 0.3
    assert np.isfinite(cost)


def test_kinova_save_and_playback(tmp_path):
    from drake_ddp_tpu.examples import kinova_gen3 as kg

    cfg = kg.Config(scenario="side", T=0.1, verbose=False)  # tiny horizon
    ilqr = kg.build_solver(cfg)
    ilqr.config = ilqr.config._replace(max_iters=2)
    ilqr._solve_fn = None  # force re-jit with the reduced budget
    import jax
    from drake_ddp_tpu.solver.ilqr import solve_ilqr
    ilqr._solve_fn = jax.jit(
        lambda prob: solve_ilqr(ilqr.system, ilqr.config, prob))
    f = str(tmp_path / "side.npz")
    x, u, t, cost = ilqr.Solve()
    ilqr.SaveSolution(f)

    html = str(tmp_path / "play.html")
    ts, x_bar = kg.playback(f, cfg, html_out=html)
    N = int(cfg.T / cfg.dt)
    assert x_bar.shape == (27, N - 1)
    assert np.allclose(x_bar, x[:, :-1])
    assert len(open(html).read()) > 1000
