"""Timing harnesses (reference utils/ocp_benchmarker.hpp:13-16 +
bindings/python/robotoc/utils/benchmark.py:4-12)."""
from __future__ import annotations

import time

import jax


def cpu_time(fn, num_iterations: int = 1000, warmup: int = 1):
    """Average wall time (ms) of `fn()` over num_iterations, blocking on
    the returned pytree each call (the reference's benchmark::CPUTime)."""
    out = None
    for _ in range(warmup):
        out = fn()
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(num_iterations):
        out = fn()
    jax.block_until_ready(out)
    total_ms = 1e3 * (time.perf_counter() - t0)
    print(f"total CPU time: {total_ms:.3f} ms "
          f"({total_ms / num_iterations:.5f} ms per update)")
    return total_ms / num_iterations


class Timer:
    """chrono-style tick/tock (reference utils/timer.hpp:12-50)."""

    def __init__(self):
        self._t0 = None
        self._elapsed = 0.0

    def tick(self):
        self._t0 = time.perf_counter()

    def tock(self):
        if self._t0 is not None:
            self._elapsed = time.perf_counter() - self._t0
        return self._elapsed

    def ms(self) -> float:
        return 1e3 * self._elapsed

    def s(self) -> float:
        return self._elapsed
