"""Timing utilities — the WuKTimer / getTime analogs.

The reference has two mechanisms (SURVEY.md §5): a ns wall clock around
each callback (utils.h:16-20, main.cu:69-73) and an RAII cudaEvent timer
whose instances sit commented-out at kernel call sites as opt-in probes
(core.cu:3-24). Here:

- `wall_ms` context manager: wall-clock ms around a host-side call
  (includes H2D/D2H, like the harness' timing).
- `Probe`: opt-in scoped timer printing elapsed ms on exit (the WuKTimer
  analog; enable with TPU_KNN_PROBES=1).
- `device_time_ms`: steady-state device time of a jitted callable via
  pipelined dispatch averaging (the honest kernel-time measure; pairs
  with `jax.profiler.trace` for full traces).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable


@contextlib.contextmanager
def wall_ms(out: dict, key: str = "ms"):
    t0 = time.perf_counter_ns()
    yield
    out[key] = (time.perf_counter_ns() - t0) / 1e6


PROBES_ENABLED = os.environ.get("TPU_KNN_PROBES") == "1"


class Probe:
    """RAII elapsed-ms printer (reference WuKTimer, core.cu:3-24).

    Usage (opt-in, like the reference's commented-out instances):
        with Probe("fused kernel"):
            ...
    """

    def __init__(self, label: str):
        self.label = label

    def __enter__(self):
        self.t0 = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        if PROBES_ENABLED:
            ms = (time.perf_counter_ns() - self.t0) / 1e6
            print(f"[probe] {self.label}: {ms:.3f} ms", flush=True)
        return False


def device_time_ms(fn: Callable, *args, reps: int = 10) -> float:
    """Average steady-state time of `fn(*args)` with pipelined dispatches.

    `fn` must return a jax array (or pytree); the result of the last rep is
    blocked on, so per-call host overhead amortizes away — the analog of
    cudaEvent elapsed time for a stream of kernel launches.
    """
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def trace(logdir: str):
    """jax.profiler trace context (the deep-dive probe)."""
    import jax

    return jax.profiler.trace(logdir)
