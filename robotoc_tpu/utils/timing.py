"""Wall-clock timing + benchmark helpers.

Counterpart of the reference's utils/timer.hpp + ocp_benchmarker.hpp and the
Python robotoc.utils.benchmark.cpu_time (reference
bindings/python/robotoc/utils/benchmark.py:4-12).
"""
from __future__ import annotations

import time

import jax


class Timer:
    def __init__(self):
        self.tick()

    def tick(self):
        self._t0 = time.perf_counter()

    def tock_s(self) -> float:
        return time.perf_counter() - self._t0

    def tock_ms(self) -> float:
        return 1e3 * self.tock_s()


def benchmark(fn, args=(), num_iters: int = 100, warmup: int = 1):
    """Average wall time per call with device sync (the analog of the
    reference's 10k-iteration CPUTime harness)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(num_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / num_iters
    return dict(mean_ms=1e3 * dt, iters_per_s=1.0 / dt)
