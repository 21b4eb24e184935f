"""Timing harness — the analogue of TimerGPU/TimerCPU (cudautils.h:61-107).

CUDA events become ``block_until_ready`` walls around jitted calls; per-stage
attribution comes from ``jax.profiler`` traces rather than nested timers.
"""

from __future__ import annotations

import contextlib
import time

import jax


def time_fn(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Median wall time (ms) of ``fn(*args)`` with device synchronization."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


@contextlib.contextmanager
def trace(path: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace for per-kernel attribution."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
