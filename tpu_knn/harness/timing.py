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

    WARNING (measured 2026-08-16): over the axon tunnel,
    ``block_until_ready`` does NOT reliably block — in some process states
    it returns before the device work completes, making this protocol
    under-report by 10-100x (a 5.4 ms pipeline read 0.07 ms). Benchmarks
    must use :func:`amplified_ms`, which is immune by construction; this
    helper remains for interactive probing on backends with sound
    synchronization semantics (CPU, local TPU).
    """
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def amplified_ms(step: Callable, *args, iters: int, reps: int = 2,
                 warm: bool = True) -> float:
    """Device ms per iteration of ``step``, measured inside ONE dispatch.

    Runs ``iters`` sequentially-dependent iterations of
    ``step(i, carry, *args) -> carry`` (carry: f32 scalar) under a single
    ``lax.fori_loop`` jit, and forces real completion by reading the carry
    back to the host. This is the only trustworthy kernel-time protocol on
    the axon tunnel, where ``block_until_ready`` is unreliable (see
    :func:`device_time_ms`): host wall time around a host-readback-completed
    program cannot under-measure, and per-dispatch tunnel latency (~25 ms
    round trip) amortizes to RTT/iters.

    Requirements on ``step`` (the caller's responsibility):
    - consume the kernel outputs into the returned carry (else XLA
      dead-code-eliminates the work);
    - make the computation depend on ``i`` (else XLA's loop-invariant code
      motion hoists it out of the loop and one iteration is measured as
      ``iters``). Perturbing a small operand by ``i * 1e-9`` is free; a
      perturbation of a LARGE operand is free exactly when it fuses into
      the consumer's first read pass (e.g. into a pad/transpose prep) —
      measure prepared-operand paths with only the small operand perturbed,
      which is also their serving semantics.

    ``iters`` is passed to the device as a runtime scalar, so re-timing at
    a different iteration count reuses the same executable.
    """
    run = _amplified_runner(step, args)
    if warm:
        run(1)  # compile + first-run cold start
    best = float("inf")
    for _ in range(reps):
        best = min(best, run(iters))
    return best


def _amplified_runner(step: Callable, args: tuple):
    """Compile once; return ms-per-iter as a function of the trip count.

    ``args`` are forwarded as jit ARGUMENTS — a closure-captured device
    array would be baked into the program as a constant (the remote-compile
    request then ships the whole array; observed HTTP 413 at 512 MB)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def loop(iters, *a):
        return jax.lax.fori_loop(
            0, iters, lambda i, c: step(i, c, *a), jnp.float32(0.0))

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        np.asarray(loop(jnp.int32(iters), *args))
        return (time.perf_counter() - t0) / iters * 1e3

    return run


def calibrated_amplified_ms(step: Callable, *args, target_ms: float = 400.0,
                            max_iters: int = 8192, reps: int = 2):
    """:func:`amplified_ms` with the iteration count calibrated so one
    timed dispatch lasts ~``target_ms``, amortizing the tunnel round trip
    (~25 ms) to <~5% for sub-ms kernels without wasting minutes on slow
    ones. Because a short probe of a fast kernel is itself RTT-dominated,
    the trip count is refined over a few rounds: each round re-estimates
    per-iteration cost from the previous (longer) run until the dispatch
    reaches the target length or the cap. Returns (ms_per_iter, iters)."""
    run = _amplified_runner(step, args)
    run(1)  # compile + cold start
    iters, est = 8, run(8)
    while iters < max_iters and iters * est < 0.8 * target_ms:
        iters = max(iters, min(max_iters, int(target_ms / max(est, 1e-4))))
        est = run(iters)
    best = est
    for _ in range(reps - 1):
        best = min(best, run(iters))
    return best, iters


def trace(logdir: str):
    """jax.profiler trace context (the deep-dive probe)."""
    import jax

    return jax.profiler.trace(logdir)
