"""Decompose knn_graph's cold time at n=2^17 (k=16, K=15): how much is
the one chunk-pipeline compile vs the prep vs the 128 chunk dispatches
vs the compaction epilogue."""
import time

import jax
import jax.numpy as jnp

from tpu_knn.kernels import topk as T

n, k, kk = 2 ** 17, 16, 16   # graph asks K+1 = 16


def tic():
    return time.perf_counter()


pts = jax.jit(lambda: jax.random.uniform(jax.random.PRNGKey(0), (n, k),
                                         jnp.float32))()
jax.block_until_ready(pts)

t0 = tic()
method = T._auto_method(n, kk)
print("auto method:", method)

# Build + prep (what topk_knn does before the engine runs).
t0 = tic()
idx, d2 = T.topk_knn(pts[: T.SEEDED_CHUNK_ROWS], pts, kk, method=method)
jax.block_until_ready((idx, d2))
print(f"one-chunk cold (compile + 1 dispatch): {tic() - t0:.1f} s")

t0 = tic()
idx, d2 = T.topk_knn(pts[: T.SEEDED_CHUNK_ROWS], pts, kk, method=method)
jax.block_until_ready((idx, d2))
print(f"one-chunk warm: {(tic() - t0) * 1e3:.0f} ms")

t0 = tic()
idx, d2 = T.topk_knn(pts, pts, kk, method=method)
jax.block_until_ready((idx, d2))
print(f"full m=2^17 cold-after-chunk-compile: {tic() - t0:.1f} s")

t0 = tic()
idx, d2 = T.topk_knn(pts, pts, kk, method=method)
jax.block_until_ready((idx, d2))
print(f"full m=2^17 warm: {tic() - t0:.2f} s")
