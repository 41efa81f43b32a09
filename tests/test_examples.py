"""End-to-end example-task regression tests (SURVEY.md §4 layer (d)):
each reference task must solve with a sensible cost and reach its target.
"""

import numpy as np
import pytest

import jax


def test_pendulum_example():
    from drake_ddp_tpu.examples import pendulum as ex

    states, inputs, t, cost = ex.run(ex.Config(verbose=False))
    assert abs(states[0, -1] - np.pi) < 0.1
    assert cost < 1.0


def test_cart_pole_example():
    from drake_ddp_tpu.examples import cart_pole as ex

    states, inputs, t, cost = ex.run(ex.Config(verbose=False))
    # swing-up reached (theta -> pi, modulo mirror symmetry of the model)
    assert abs(abs(states[1, -1]) - np.pi) < 0.2


def test_acrobot_example_short():
    from drake_ddp_tpu.examples import acrobot as ex

    # shortened horizon for CI: verify it makes progress toward upright,
    # and pin the associative-scan Riccati (the acrobot default — the
    # reference's longest horizon, N=750) against the sequential sweep.
    # CPU timing note: at N=750/60 iters parscan is ~4x slower on CPU
    # (15.2 s vs 3.8 s wall) — its O(log N)-depth win is a TPU
    # characteristic; cost deltas are sub-0.1% (1.71374 vs 1.71549).
    cfg = ex.Config(T=1.5, max_iters=40, verbose=False,
                    parallel_backward=True)
    states, inputs, t, cost = ex.run(cfg)
    assert np.all(np.isfinite(states))
    cfg_seq = ex.Config(T=1.5, max_iters=40, verbose=False,
                        parallel_backward=False)
    _, _, _, cost_seq = ex.run(cfg_seq)
    assert cost == pytest.approx(cost_seq, rel=0.01)


def test_acrobot_mpc_mode():
    from drake_ddp_tpu.examples import acrobot as ex

    cfg = ex.Config(T=0.4, MPC=True, num_resolves=3, replan_steps=2,
                    max_iters=15, verbose=False)
    states, u, t, costs = ex.run(cfg)
    assert states.shape[1] == int(0.4 / 0.004) + 3 * 2
    assert np.all(np.isfinite(costs))


def test_cart_pole_with_wall_contact_sequence():
    """The headline behavior: iLQR discovers a wall bounce and recovers
    the pole to upright (reference cart_pole_with_wall.py).  Contact
    local optima here span costs 25..1100, so the example solves with a
    batched multi-start (solver/multistart.py)."""
    from drake_ddp_tpu.examples import cart_pole_with_wall as ex

    states, inputs, t, cost = ex.run(ex.Config(verbose=False))
    # golden pin (VERDICT item 9): seeded multistart is deterministic;
    # recorded on CPU f32 at the continuation-Newton contact solve
    assert cost == pytest.approx(5.7024, rel=0.02)
    # recovered near upright
    assert abs(states[1, -1] - np.pi) < 0.25
    # the ball actually touched the wall (tip reaches the contact surface)
    tipx = states[0] + 0.5 * np.sin(states[1])
    assert tipx.min() < -0.39
