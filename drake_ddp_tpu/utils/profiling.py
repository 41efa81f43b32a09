"""Profiling & timing instrumentation (SURVEY.md §5 "Tracing/profiling").

The reference brackets solver phases with wall-clock timers and prints a
per-iteration table (reference ilqr.py:364-372, 685-704).  Inside a
fused XLA program phases can't be timed from the host, so the TPU-native
equivalents are:

- :class:`phase_timer`: host-side wall-clock bracketing for the
  *host-visible* phases (compile, device calls, MPC chunks) — the moral
  equivalent of the reference's time_fp / time_getDerivs counters;
- :func:`trace`: a `jax.profiler` trace context producing a TensorBoard/
  Perfetto trace of the device timeline (per-kernel timing, the real
  on-device phase breakdown).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class phase_timer:
    """Accumulate named wall-clock spans.

    >>> t = phase_timer()
    >>> with t("solve"):
    ...     run()
    >>> t.report()
    {'solve': 1.23}
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        st = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - st
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return dict(self.totals)

    def pretty(self) -> str:
        rows = [
            f"  {k:<24s} {v:8.3f} s  (x{self.counts[k]})"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "phase timings:\n" + "\n".join(rows)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/drake_ddp_tpu_trace") -> Iterator[str]:
    """Capture a jax.profiler device trace around a block.

    View with TensorBoard (`tensorboard --logdir <dir>`) or upload the
    .perfetto trace.  Keep traced regions short (one solve, not a whole
    benchmark): traces are large.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
