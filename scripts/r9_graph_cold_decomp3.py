"""Honest warm timing of inlined vs eager-chunk seeded top-K at
m=n=2^17: every rep ends in a HOST READBACK of a checksum that depends
on every output row (the DCE/async traps both closed)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.kernels import topk as T
from tpu_knn.utils.shapes import round_up

n, k, kk = 2 ** 17, 16, 16
m = n

pts = jax.jit(lambda: jax.random.uniform(jax.random.PRNGKey(0), (n, k),
                                         jnp.float32))()
jax.block_until_ready(pts)

# One-shot RTT estimate: tiny eager op + readback.
for _ in range(3):
    t0 = time.perf_counter()
    float((pts[0, 0] + 1.0)[None][0])
    rtt = time.perf_counter() - t0
print(f"tunnel rtt ~{rtt * 1e3:.1f} ms")


def bench(fn, reps=5):
    fn()                      # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        i, d = fn()
        s = float(np.asarray(i.sum() + d.sum().astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts), s


go = T._build_topk_percall(m, n, k, kk, "packed", "seeded")
ta, sa = bench(lambda: go(pts, pts))
print(f"A inlined warm (sync): {ta * 1e3:.1f} ms")

n_ops = round_up(n, 8192)
run = T._build_topk(m, n, k, kk, n_ops, "packed", "seeded")
k_pad = round_up(k, 8)
prep = jax.jit(lambda r: jnp.pad(r, ((0, n_ops - n), (0, k_pad - k))).T)
tb, sb = bench(lambda: run(pts, (prep(pts),), pts))
print(f"B eager-chunks warm (sync): {tb * 1e3:.1f} ms")
print("checksums equal:", sa == sb)
