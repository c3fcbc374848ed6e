"""Real-TPU spot check after the pick_tiles short-n policy change.

Confirms the new default geometry reproduces the sweep's win on the
per-call path, the prepared-index path, and the short-n top-K sweep
engine, with correctness gates vs the oracle.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import fused_knn
from tpu_knn.kernels.tuning import pick_tiles

def oracle_argmin(qh, rh, chunk=64):
    import numpy as np
    outs = []
    for s in range(0, qh.shape[0], chunk):
        d2 = ((qh[s:s+chunk, None, :] - rh[None, :, :]) ** 2).sum(-1)
        outs.append(d2.argmin(1))
    return np.concatenate(outs)


for k in (3, 16):
    m, n = 1024, 65536
    print(f"pick_tiles(k={k}, m={m}, n={n}) = {pick_tiles(k, m, n)} "
          f"wide={pick_tiles(k, m, n, wide=True)}", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((m, k), np.float32))
    r = jnp.asarray(rng.random((n, k), np.float32))

    # correctness vs numpy oracle
    qh, rh = np.asarray(q), np.asarray(r)
    want = oracle_argmin(qh, rh)
    idx, dd = fused_knn(q, r)
    got = np.asarray(idx)
    bad = int((got != want).sum())
    print(f"k={k} per-call gate: {bad}/{m} mismatches", flush=True)
    assert bad == 0, (k, np.nonzero(got != want)[0][:5])

    def step(i, c, q, r):
        eps = i.astype(jnp.float32) * 1e-9
        ix, dv = fused_knn(q + eps, r + eps)
        return c + dv.sum() + ix.sum().astype(jnp.float32)

    ms, it = calibrated_amplified_ms(step, q, r)
    print(f"k={k} per-call default tiles now: {ms:.3f} ms (x{it})",
          flush=True)

# prepared index path at the same shape
from tpu_knn.engine.index import NNIndex

for k in (3, 16):
    m, n = 1024, 65536
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.random((m, k), np.float32))
    r = np.asarray(rng.random((n, k), np.float32))
    ix = NNIndex(r)
    got = np.asarray(ix.query(q)[0])
    want = oracle_argmin(np.asarray(q), r)
    bad = int((got != want).sum())
    print(f"k={k} NNIndex gate: {bad}/{m} mismatches", flush=True)
    assert bad == 0

    def istep(i, c, q):
        eps = i.astype(jnp.float32) * 1e-9
        ii, dv = ix.query(q + eps)
        return c + dv.sum() + ii.sum().astype(jnp.float32)

    ms, it = calibrated_amplified_ms(istep, q)
    print(f"k={k} NNIndex prepared now: {ms:.3f} ms (x{it})", flush=True)

# short-n top-K sweep engine (pick_tiles caller, K-state VMEM growth)
from tpu_knn.kernels.topk import topk_knn

m, n, k, K = 64, 65536, 16, 8
rng = np.random.default_rng(2)
q = jnp.asarray(rng.random((m, k), np.float32))
r = jnp.asarray(rng.random((n, k), np.float32))
ti, td = topk_knn(q, r, K)
d2 = ((np.asarray(q)[:, None, :] - np.asarray(r)[None, :, :]) ** 2).sum(-1)
want = np.argsort(d2, axis=1, kind="stable")[:, :K]
bad = int((np.asarray(ti) != want).sum())
print(f"topk m={m} n={n} K={K} gate: {bad}/{m*K} mismatches", flush=True)
assert bad == 0


def tstep(i, c, q, r):
    eps = i.astype(jnp.float32) * 1e-9
    ii, dv = topk_knn(q + eps, r + eps, K)
    return c + dv.sum() + ii.sum().astype(jnp.float32)


ms, it = calibrated_amplified_ms(tstep, q, r)
print(f"topk short-n sweep now: {ms:.3f} ms (x{it})", flush=True)
print("ALL OK", flush=True)
