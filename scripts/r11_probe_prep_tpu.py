"""TPU probe: does the pinned prep (pad+T -> Pallas fence) timing scale
with n, and what does a plain elementwise copy of the same footprint cost?
If prep_ms scales linearly and the copy measures the same GB/s, the number
is a real measurement of the relayout; if prep_ms is flat in n, the fence
leaks and the protocol is still broken."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import _make_pin
from tpu_knn.harness.timing import calibrated_amplified_ms

pin = _make_pin()
k = 16
kp = 16

for n in (1 << 20, 1 << 22, 1 << 24):
    r = jax.random.uniform(jax.random.PRNGKey(0), (n, k), jnp.float32)

    @jax.jit
    def _prep(rr):
        return jnp.pad(rr, ((0, 0), (0, kp - k))).T

    def prep_step(i, c, r):
        out = _prep(r + i.astype(jnp.float32) * 1e-9)
        return c + jnp.sum(pin(out))

    ms, it = calibrated_amplified_ms(prep_step, r, target_ms=300.0)
    gbps = 2 * n * kp * 4 / (ms / 1e3) / 1e9

    # Bandwidth reference: elementwise copy of the same (kp, n) footprint.
    big = jnp.zeros((kp, n), jnp.float32)

    def copy_step(i, c, big):
        out = big + i.astype(jnp.float32) * 1e-9
        return c + jnp.sum(pin(out))

    cms, cit = calibrated_amplified_ms(copy_step, big, target_ms=300.0)
    cgbps = 2 * n * kp * 4 / (cms / 1e3) / 1e9
    print(f"n=2^{n.bit_length()-1}: prep {ms:7.3f} ms ({gbps:6.1f} GB/s) "
          f"x{it} | copy {cms:7.3f} ms ({cgbps:6.1f} GB/s) x{cit}",
          flush=True)
