"""r22: per-chip capacity ladder at embedding-scale k=768 (VERDICT r4
item 1: "MESH_SCALING capacity rows at k=768").

Byte arithmetic per point at k=768: f32 resident = AoS + SoA = 6144 B,
bf16 = 3072 B, int8 = 768 B (grid only — but batch queries materialize
a bf16 grid operand per call, so the BATCH-serving ceiling is bounded
by grid + 1536n per-call bytes; m=1 serves off the grid alone). This
probe finds the largest power-of-two n that BUILDS AND SERVES (m=1 and
m=128 batch) on the real 16 GB v5e for each store, walking DOWN from
the byte-arithmetic bound so the first success is the ceiling.

Run alone (never concurrently with other TPU work):
  python scripts/r22_capacity_k768.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K = 768


def try_mode(n_log2: int, store: str, batch: bool) -> bool:
    from tpu_knn.engine.index import NNIndex

    n = 1 << n_log2
    label = f"n=2^{n_log2} k={K} store={store} batch={batch}"
    try:
        if store == "int8":
            # The capacity entry is from_int8_grid (host grid, no f32
            # staging): building int8 FROM an f32 device source needs
            # the 4-byte source resident, which caps the build at the
            # f32 tier — the very thing the grid mode exists to beat
            # (same protocol as scripts/r10_probe_int8_capacity.py).
            rng = np.random.default_rng(7)
            grid = rng.integers(-127, 128, (n, K), dtype=np.int8)
            zero = np.zeros(K, np.float32)
            ix = NNIndex.from_int8_grid(grid, zero, 1.0 / 127.0)
            del grid
        else:
            chunks = max(1, n >> 18)
            dt = jnp.bfloat16 if store == "bf16" else jnp.float32
            ref = jnp.concatenate([
                jax.random.uniform(jax.random.PRNGKey(100 + c),
                                   (n // chunks, K), dtype=dt)
                for c in range(chunks)])
            jax.block_until_ready(ref)
            ix = NNIndex(ref, store=store)
            del ref
        m = 128 if batch else 1
        run, ops = ix.pipeline(m)
        q = jax.random.uniform(jax.random.PRNGKey(4), (m, K), jnp.float32)
        t0 = time.perf_counter()
        ia, da = run(q, *ops)
        s = float(np.asarray(jax.device_get(da)).sum())
        ms = (time.perf_counter() - t0) * 1e3
        print(f"  OK {label}: first call {ms:.0f} ms (checksum {s:.3g})",
              flush=True)
        del ix, run, ops
        return True
    except Exception as e:
        print(f"  FAIL {label}: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return False


def main():
    _ = jax.device_get(jnp.zeros((8, 128)))
    results = {}
    import os
    only = os.environ.get("R22_ONLY")
    tiers = (("float32", 21), ("bf16", 22), ("int8", 23))
    if only:
        tiers = tuple(t for t in tiers if t[0] == only)
    for store, start in tiers:
        for batch in (False, True):
            p = start
            while p >= 18 and not try_mode(p, store, batch):
                p -= 1
            results[(store, batch)] = p
            print(f"{store} batch={batch}: ceiling 2^{p}", flush=True)
    print("\nsummary:", {f"{s}/m{'128' if b else '1'}": f"2^{p}"
                         for (s, b), p in results.items()}, flush=True)


if __name__ == "__main__":
    main()
