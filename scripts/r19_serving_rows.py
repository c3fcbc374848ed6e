"""r19: honest serving rows for the round-4 artifact refresh.

r16's "batch top-16 (eager)" rows were polluted by a ~2 s first-touch
transient after index build (any path, first ~12 dispatches — see
/tmp/probe_ixq2.log: 185 ms/call then 7.5 steady). Re-measure with a
real warm phase, plus the embedding-scale top-16 rows.

Run on the real chip: python scripts/r19_serving_rows.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.engine.index import NNIndex

KEY = jax.random.PRNGKey(19)


def steady_ms(f, warm=16, reps=20):
    for _ in range(warm):
        out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(reps):
        o = f()
        c = c + o[0].astype(jnp.float32).sum() + o[1].sum()
    np.asarray(c)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for k, store_list in [(16, ("float32", "bf16", "int8"))]:
        m, n = 1024, 1 << 20
        kq = jax.random.fold_in(KEY, k)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k))
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k))
        for store in store_list:
            ix = NNIndex(r, store=store)
            for kk in (16, 64):
                ms = steady_ms(lambda: ix.query(q, neighbors=kk))
                print(f"k={k} store={store} top-{kk} m={m}: "
                      f"{ms:.3f} ms/call", flush=True)
            del ix
    for k in (128, 768):
        m, n = 1024, 1 << 20
        kq = jax.random.fold_in(KEY, 1000 + k)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k))
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k))
        ix = NNIndex(r)
        ms = steady_ms(lambda: ix.query(q, neighbors=16), warm=8, reps=10)
        print(f"k={k} store=float32 top-16 m={m}: {ms:.3f} ms/call",
              flush=True)
        del ix, q, r


if __name__ == "__main__":
    main()
