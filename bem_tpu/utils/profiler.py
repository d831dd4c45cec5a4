"""Tracing / profiling helpers.

The reference has wall-clock timers only (AvgTimer, perf_counter spans —
SURVEY §5 "Tracing"). TPU-native superset: the JAX profiler captures full
XLA traces viewable in TensorBoard/Perfetto, plus an honest device-timing
helper (some remote TPU transports make block_until_ready a no-op, so the
timer forces a scalar fetch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bem_trace"):
    """Capture a JAX profiler trace: view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median seconds per call, forcing a device->host scalar fetch."""
    g = jax.jit(lambda *a: jnp.sum(jnp.asarray(fn(*a))))
    for _ in range(warmup):
        float(g(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(g(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def annotate(name: str):
    """Named profiler span (shows up in the XLA trace)."""
    return jax.profiler.TraceAnnotation(name)
