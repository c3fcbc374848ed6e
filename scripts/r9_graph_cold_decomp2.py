"""Verify the giant-inlined-program warm time at m=n=2^17 with repeated
iterations and a checksum consumption (DCE honesty), and compare the
eager chunk loop (run_chunked called outside jit) on the same geometry."""
import time

import jax
import jax.numpy as jnp

from tpu_knn.kernels import topk as T
from tpu_knn.utils.shapes import round_up

n, k, kk = 2 ** 17, 16, 16
m = n

pts = jax.jit(lambda: jax.random.uniform(jax.random.PRNGKey(0), (n, k),
                                         jnp.float32))()
jax.block_until_ready(pts)


def timeit(f, reps=5):
    f()  # warm
    jax.block_until_ready(chk())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


last = [None]


def chk():
    return last[0]


# Path A: the outer-jit (inlined) per-call engine, already compiled in a
# prior process? No — fresh process: time its cold too.
t0 = time.perf_counter()
go = T._build_topk_percall(m, n, k, kk, "packed", "seeded")
idx, d2 = go(pts, pts)
jax.block_until_ready((idx, d2))
print(f"A inlined: cold {time.perf_counter() - t0:.1f} s")


def run_a():
    i, d = go(pts, pts)
    last[0] = (i.sum(), d.sum())
    return last[0]


print(f"A inlined: warm {timeit(run_a) * 1e3:.1f} ms")

# Path B: eager chunk loop — prep jitted separately, chunks enqueued.
prec = "packed"
n_ops = round_up(n, 8192)
run = T._build_topk(m, n, k, kk, n_ops, prec, "seeded")
k_pad = round_up(k, 8)
prep = jax.jit(lambda r: jnp.pad(r, ((0, n_ops - n), (0, k_pad - k))).T)

t0 = time.perf_counter()
r_op = prep(pts)
i, d = run(pts, (r_op,), pts)
jax.block_until_ready((i, d))
print(f"B eager-chunks: cold {time.perf_counter() - t0:.1f} s")


def run_b():
    r_op = prep(pts)
    i, d = run(pts, (r_op,), pts)
    last[0] = (i.sum(), d.sum())
    return last[0]


print(f"B eager-chunks: warm {timeit(run_b) * 1e3:.1f} ms")

ia, da = go(pts, pts)
ib, db = run(prep(pts), (prep(pts),), pts) if False else run(pts, (prep(pts),), pts)
import numpy as np
print("match:", bool((np.asarray(ia) == np.asarray(ib)).all()),
      bool(np.allclose(np.asarray(da), np.asarray(db))))
