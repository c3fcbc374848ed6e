"""r17c: compact+solve geometry sweep at the real K16/K64 densities.

The two-stage (32-part + sort-merge) fast tier measured WORSE end to end
(K16 6.56 -> 7.06, K64 12.8 -> 16.6): the slot-loop unit model missed
the fine split's grid/DMA overhead. Time _compact_and_solve directly at
(m=1024) for single-stage vs two-stage part counts.

Run on the real chip: python scripts/r17_compact_variants.py

HISTORICAL (r4): the ``merge`` parameter this probe swept was measured
a loss and removed from _compact_and_solve the same day; kept as the
record behind PERF_NOTES "Round-4" measured negatives.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels import topk as T

M = 1024


def consume_rows(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c


def bench(nc, quals_per_row, solvable, cell, cases):
    rng = np.random.default_rng(3)
    qual = np.zeros((M, nc), bool)
    for r in range(M):
        qual[r, rng.choice(nc, quals_per_row, replace=False)] = True
    lanes = rng.integers(0, cell, (M, nc))
    a = np.where(qual, 1 | (lanes << 2) | (lanes * lanes << 12),
                 0).astype(np.int32)
    fields = (jnp.asarray(a),)
    if solvable == 3:
        p3 = np.where(qual, (lanes ** 3).astype(np.int64) % (1 << 26),
                      0).astype(np.int32)
        fields = fields + (jnp.asarray(p3),)
    n = nc * cell
    for parts, cap, merge in cases:
        try:
            def step(i, c, *fs):
                fs = tuple(jnp.roll(f, i, axis=0) for f in fs)
                cols, _v, ok = T._compact_and_solve(
                    M, nc, parts, cap, fs, cell=cell, n=n,
                    solvable=solvable, merge=merge)
                return consume_rows(c, cols, ok.astype(jnp.int32))

            ms, it = calibrated_amplified_ms(step, *fields)
            print(f"nc={nc} q/row={quals_per_row} sv={solvable} "
                  f"parts={parts} cap={cap} merge={merge}: {ms:.3f} ms "
                  f"(x{it})", flush=True)
        except Exception as e:
            print(f"nc={nc} parts={parts} cap={cap} merge={merge}: "
                  f"FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # K16 geometry: nc=4096 (cell 256), ~22 quals/row, quadratic
    bench(4096, 22, 2, 256, [
        (1, 48, None),
        (32, 8, 48), (16, 12, 48), (8, 12, 48), (8, 16, 48),
    ])
    # K64 geometry: nc=8192 (cell 128), ~110 quals/row, cubic
    bench(8192, 110, 3, 128, [
        (4, 48, None),
        (32, 16, 192), (16, 16, 192), (8, 24, 192), (16, 24, 192),
    ])


if __name__ == "__main__":
    main()
