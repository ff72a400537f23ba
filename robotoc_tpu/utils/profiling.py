"""Profiling hooks: XLA/TPU traces + per-phase wall-clock breakdown.

The reference's only instrumentation is a chrono Timer gated by
SolverOptions::enable_benchmark (reference utils/timer.hpp:12-50,
solver_statistics.hpp:56 cpu_time). Here:

  * `trace(logdir)` — context manager around jax.profiler.trace: captures a
    full XLA/TPU trace (HLO op timeline, memory) viewable in
    TensorBoard/XProf/Perfetto;
  * `annotate(name)` — TraceAnnotation wrapper so solver phases (build /
    riccati / expand) show up as named spans inside the device trace;
  * `PhaseTimer` — host-side per-phase accumulator (ms totals + counts)
    for quick breakdowns without a trace viewer.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a device trace (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Host-side per-phase accumulator.

    with timer.phase("build"): ...   -> timer.report() dict of ms totals.
    Blocks on device results (block_until_ready) so the measured span is
    real device time, not dispatch time.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            self.totals[name] += (time.perf_counter() - t0) * 1e3
            self.counts[name] += 1

    def report(self):
        return {k: dict(total_ms=round(v, 3), calls=self.counts[k],
                        mean_ms=round(v / max(self.counts[k], 1), 3))
                for k, v in sorted(self.totals.items())}
