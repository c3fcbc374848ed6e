"""Probe: consumption protocols for the prep (pad+T relayout) timing step.

Review r3 found the corner-read consumption (`out[0,0] + out[-1,-1]`) is
fully dead-code-eliminated (prep_ms measured a dead program; committed
BENCH_DETAILS values implied 1.3-6 TB/s on a ~0.8 TB/s part). Candidate
fixes measured here on XLA:CPU at two sizes (scaling with n is the tell):

  corner   — the broken protocol (expect ~0, size-independent)
  sum      — checksum over the transposed output (expect ~a read pass:
             XLA commutes reduce-all through transpose and never builds
             the relayout)
  barrier  — lax.optimization_barrier on the output, then corner read
             (expect ~copy cost, scaling with n: the barrier pins the
             materialized transpose)
  copy     — explicit device_put-free baseline: out must feed a per-row
             op that cannot cross the transpose (gather of one element
             per ROW of the output = n lane reads)
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import sys

sys.path.insert(0, "/root/repo")

from tpu_knn.harness.timing import calibrated_amplified_ms  # noqa: E402

k, kp = 16, 16

for n in (1 << 20, 1 << 22):
    r = jnp.asarray(np.random.default_rng(0).random((n, k), np.float32))

    @jax.jit
    def _prep(rr):
        return jnp.pad(rr, ((0, 0), (0, kp - k))).T

    def corner(i, c, r):
        out = _prep(r + i.astype(jnp.float32) * 1e-9)
        return c + out[0, 0] + out[-1, -1]

    def checksum(i, c, r):
        out = _prep(r + i.astype(jnp.float32) * 1e-9)
        return c + jnp.sum(out) * 1e-9

    def barrier(i, c, r):
        out = _prep(r + i.astype(jnp.float32) * 1e-9)
        out = jax.lax.optimization_barrier(out)
        return c + out[0, 0] + out[-1, -1]

    for name, step in (("corner", corner), ("checksum", checksum),
                       ("barrier", barrier)):
        ms, it = calibrated_amplified_ms(step, r, target_ms=300.0)
        gbps = 2 * n * kp * 4 / (ms / 1e3) / 1e9
        print(f"n=2^{n.bit_length()-1} {name:9s} {ms:8.3f} ms  "
              f"(r+w {gbps:7.1f} GB/s)  x{it}", flush=True)
