"""r7 probe: can the K<=64 compaction wall (12 per-part top_k calls,
~9 ms of the 20.8 ms total at K=64) be collapsed by BATCHING the part
axis into the top_k batch dimension?

The fast tier compacts 3 packed keys over 4 cell-axis parts with a
Python loop of 12 lax.top_k calls on (1024, 2048) slices (topk.py
`recover`). Row-major (m, nc) with parts as contiguous pw-wide chunks
reshapes for FREE to (m*parts, pw), so per-part top_k == one batched
top_k per key. This probe times, at the K=64 geometry (m=1024, nc=8192,
pw=2048, cap 48):

  A. loop-per-part:   keys x parts top_k calls on (m, pw) slices
  B. batched reshape: keys       top_k calls on (m*parts, pw)
  C. batched + stacked keys: ONE top_k call on (keys*m*parts, pw)
     (keys select identical slots, so stacking them into the batch dim
     is also exact — decode splits the output back)

plus the 2-key K<=32 geometry (m=1024, nc=4096, parts=1, cap 48) with
key stacking.

Run on the real chip: python scripts/r7_probe_compact.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms

M, NC, PARTS, CAP, KEYS = 1024, 8192, 4, 48, 3
PW = NC // PARTS


def make_keys(seed, m, nc, keys, qual_per_row=110):
    rng = np.random.default_rng(seed)
    out = []
    qual = np.zeros((m, nc), np.int32)
    for r in range(m):
        cols = rng.choice(nc, size=qual_per_row, replace=False)
        qual[r, cols] = 1
    r_iota = np.arange(nc, dtype=np.int32)[None, :] % (nc // PARTS)
    head = np.where(qual, (1 << 30) | (((nc // PARTS) - 1 - r_iota) << 18), 0)
    for _k in range(keys):
        payload = rng.integers(0, 1 << 18, size=(m, nc), dtype=np.int32)
        out.append(jnp.asarray(head | np.where(qual, payload, 0)))
    return out


def main():
    ks = make_keys(0, M, NC, KEYS)

    def loop_per_part(i, c, *keys):
        acc = c
        for kq in keys:
            kq = kq + i  # loop-variant
            for p in range(PARTS):
                v = jax.lax.top_k(kq[:, p * PW:(p + 1) * PW], CAP)[0]
                acc = acc + v[0, 0].astype(jnp.float32) * 1e-9
        return acc

    def batched(i, c, *keys):
        acc = c
        for kq in keys:
            kq = (kq + i).reshape(M * PARTS, PW)
            v = jax.lax.top_k(kq, CAP)[0]
            acc = acc + v[0, 0].astype(jnp.float32) * 1e-9
        return acc

    def stacked(i, c, *keys):
        kq = jnp.concatenate([(kq + i).reshape(M * PARTS, PW) for kq in keys])
        v = jax.lax.top_k(kq, CAP)[0]
        return c + v[0, 0].astype(jnp.float32) * 1e-9

    for name, fn in [("A loop 12 calls", loop_per_part),
                     ("B batched 3 calls (4096,2048)", batched),
                     ("C stacked 1 call (12288,2048)", stacked)]:
        ms, it = calibrated_amplified_ms(fn, *ks)
        print(f"{name}: {ms:.3f} ms (x{it})", flush=True)

    # K<=32 geometry: nc=4096 single part, 2 keys, cap 48
    ks2 = make_keys(1, M, 4096, 2, qual_per_row=50)

    def single(i, c, *keys):
        acc = c
        for kq in keys:
            v = jax.lax.top_k(kq + i, CAP)[0]
            acc = acc + v[0, 0].astype(jnp.float32) * 1e-9
        return acc

    def single_stacked(i, c, *keys):
        kq = jnp.concatenate([kq + i for kq in keys])
        v = jax.lax.top_k(kq, CAP)[0]
        return c + v[0, 0].astype(jnp.float32) * 1e-9

    for name, fn in [("D K32 2 calls (1024,4096)", single),
                     ("E K32 stacked 1 call (2048,4096)", single_stacked)]:
        ms, it = calibrated_amplified_ms(fn, *ks2)
        print(f"{name}: {ms:.3f} ms (x{it})", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    print("devices:", jax.devices(), flush=True)
    main()
    print(f"total {time.time() - t0:.1f}s")
