#!/usr/bin/env python3
"""Decompose the one-shot dispatch path (VERDICT r2 item 8).

BENCH_DETAILS' `dispatch_ms` (~26-30 ms) is the latency an isolated call
sees over the axon tunnel; PERF_NOTES asserted "tens of µs on a local
TPU host" without a number. This probe separates the components that CAN
be measured from here:

- enqueue_ms: host-side cost of dispatching a compiled executable
  WITHOUT waiting (async enqueue returns immediately) — the part a
  local host pays per call on the dispatch path.
- rtt_ms: full round trip of a minimal program (identity on (8, 128))
  with a host readback — enqueue + tunnel + scheduling + readback; the
  kernel itself is microseconds, so this IS the tunnel+runtime constant.
- kernel_ms: amplified in-dispatch device time of a real pipeline
  (ds4-like (16, 1, 65536) fused query) — the compute component.
- oneshot_ms: wall time of that same pipeline as an isolated
  dispatch+readback call; oneshot_ms - kernel_ms - rtt_ms ~ 0 confirms
  the decomposition closes.

Writes docs/DISPATCH_DECOMP.json. Run alone (one TPU process at a time).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stats(samples):
    a = np.asarray(samples)
    return {"min": float(a.min()), "p50": float(np.median(a)),
            "p90": float(np.percentile(a, 90)), "n": len(a)}


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn.harness.timing import calibrated_amplified_ms

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    out = {}

    # Minimal program: identity-plus-epsilon on one (8, 128) tile.
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    np.asarray(tiny(x))  # compile + cold start

    # enqueue-only: call, do NOT touch the result (async dispatch).
    enq = []
    for _ in range(200):
        t0 = time.perf_counter()
        y = tiny(x)
        enq.append((time.perf_counter() - t0) * 1e3)
    np.asarray(y)  # drain
    out["enqueue_ms"] = stats(enq)

    # full round trip with readback.
    rtt = []
    for _ in range(60):
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        rtt.append((time.perf_counter() - t0) * 1e3)
    out["rtt_ms"] = stats(rtt)

    # a real pipeline: ds4-like fused query (16, 1, 65536).
    from tpu_knn.kernels.fused import fused_knn

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((1, 16), np.float32))
    r = jnp.asarray(rng.random((65536, 16), np.float32))
    jax.block_until_ready((q, r))

    def step(i, c, q, r):
        eps = i.astype(jnp.float32) * 1e-9
        idx, d2 = fused_knn(q + eps, r + eps)
        return c + d2[0] + idx[0].astype(jnp.float32) * 1e-9

    kernel_ms, iters = calibrated_amplified_ms(step, q, r)
    out["kernel_ms"] = {"amplified": kernel_ms, "iters": iters}

    one = []
    for i in range(40):
        t0 = time.perf_counter()
        idx, d2 = fused_knn(q + np.float32(i) * 1e-9, r)
        np.asarray(d2)
        one.append((time.perf_counter() - t0) * 1e3)
    out["oneshot_ms"] = stats(one)
    out["residual_ms"] = (out["oneshot_ms"]["p50"] - kernel_ms
                          - out["rtt_ms"]["p50"])
    out["note"] = (
        "oneshot = rtt + kernel + residual; enqueue_ms is the host-side "
        "dispatch cost a LOCAL TPU host would pay per call (no tunnel "
        "wait) — the measured stand-in for PERF_NOTES' 'tens of µs on a "
        "local host' claim.")

    with open("docs/DISPATCH_DECOMP.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
