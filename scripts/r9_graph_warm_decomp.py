"""Isolate knn_graph's warm-time stages at n=2^15: the topk_knn call
(auto-routed chunked seeded engine) vs the jitted compaction epilogue.
Every timed region ends in a host readback."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tpu_knn
from tpu_knn.kernels import topk as T

n, k, kk = 2 ** 15, 16, 15

pts = jax.jit(lambda: jax.random.uniform(jax.random.PRNGKey(0), (n, k),
                                         jnp.float32))()
jax.block_until_ready(pts)


def sync(*arrs):
    return float(np.asarray(sum(a.sum().astype(jnp.float32) for a in arrs)))


# warm both paths
gi, gd = tpu_knn.knn_graph(pts, kk)
sync(gi, gd)
ti, td = T.topk_knn(pts, pts, kk + 1)
sync(ti, td)

for label, fn in [
    ("topk_knn auto (m=n=2^15, K=16)", lambda: T.topk_knn(pts, pts, kk + 1)),
    ("topk_knn seeded explicit", lambda: T.topk_knn(pts, pts, kk + 1,
                                                    method="seeded")),
    ("knn_graph full", lambda: tpu_knn.knn_graph(pts, kk)),
]:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        a, b = fn()
        sync(a, b)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1e3:.0f} ms")

# (the original argsort-based compaction measured 15.4-18.8 s eager at
# this shape — kept out of the run; docs/PERF_NOTES.md records it)
