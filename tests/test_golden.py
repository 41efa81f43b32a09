"""Golden-cost regression layer (SURVEY.md §4d).

The BASELINE parity criterion is per-solve cost within 1% of the Drake
reference; Drake isn't installed here, so the practical guard is a
regression pin against this framework's own recorded costs — any change
that moves a converged cost by >1% on the deterministic classic tasks
must be deliberate (update the goldens in the same commit and say why).

Recorded on CPU f32, zero initial guesses (deterministic — the
reference's reproducibility stance, SURVEY.md §4.3).
"""

import numpy as np
import pytest

# task -> (cost, final-state checks)
GOLDEN = {
    "pendulum": 0.2400494,
    "cart_pole": 54.18781,
    "acrobot": 1.7154926,
}


def test_pendulum_golden():
    from drake_ddp_tpu.examples import pendulum as ex
    x, u, t, c = ex.run(ex.Config(verbose=False))
    assert c == pytest.approx(GOLDEN["pendulum"], rel=0.01)
    assert abs(x[0, -1] - np.pi) < 0.01


def test_cart_pole_golden():
    from drake_ddp_tpu.examples import cart_pole as ex
    x, u, t, c = ex.run(ex.Config(verbose=False))
    assert c == pytest.approx(GOLDEN["cart_pole"], rel=0.01)
    assert abs(x[1, -1] - np.pi) < 0.05


def test_acrobot_golden():
    from drake_ddp_tpu.examples import acrobot as ex
    x, u, t, c = ex.run(ex.Config(verbose=False, max_iters=60))
    assert c == pytest.approx(GOLDEN["acrobot"], rel=0.01)
    assert abs(x[0, -1] - np.pi) < 0.05
