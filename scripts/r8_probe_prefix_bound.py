"""Round-3 probe #9: can the seeded engine's pass-1 bound come from a
PREFIX of the reference set?

Pass 1 (the per-lane 1-NN pre-pass whose 128 lane minima bound the
global K-th score) costs ~2.4 ms of the ~7 ms K=8 batch engine. The
K-th smallest of ANY subset's lane minima is still a valid upper bound,
and a CONTIGUOUS prefix is the only subset that is free to read (a
strided lane-slice of the SoA operand costs a full relayout). The
price: a looser bound admits more qualifiers, and any (row, cell) with
more qualifiers than the recovery solves (>2 quadratic at K <= 16,
>3 cubic above) falls the whole batch back to the passes engine
(23.9 ms at K=8) — so the economics hinge on the fallback probability.

This probe measures, on uniform data (k=16, n=2^20, m=1024 rows in
128-row samples), for prefix fractions 1/1, 1/2, 1/4:
  - E[qualifiers per row] (extraction/compaction load),
  - P(some cell exceeds the recovery capacity) per row and per
    1024-row batch (the lax.cond fallback trigger),
  - the implied expected cost at K=8/16/32 against the shipped
    full-pass numbers.

Run alone: python scripts/r8_probe_prefix_bound.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    print("devices:", jax.devices(), flush=True)
    n, k = 1 << 20, 16
    key = jax.random.PRNGKey(7)
    r = jax.random.uniform(jax.random.fold_in(key, 1), (n, k), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=(1, 2, 3))
    def row_stats(q, frac_log2, kk, cell):
        # exact diff-form scores for one batch of rows: (rows, n)
        d = r[None, :, :] - q[:, None, :]
        s = jnp.sum(d * d, axis=-1)
        n_pre = n >> frac_log2
        pre = s[:, :n_pre].reshape(q.shape[0], n_pre // 128, 128)
        lane_min = jnp.min(pre, axis=1)                  # (rows, 128)
        b = jnp.sort(lane_min, axis=1)[:, kk - 1][:, None]
        qual = s <= b
        quals = jnp.sum(qual, axis=1)
        cellc = jnp.sum(qual.reshape(q.shape[0], n // cell, cell), axis=2)
        return quals, jnp.max(cellc, axis=1)

    rows, reps = 128, 8
    for kk, cell, solvable in ((8, 256, 2), (16, 256, 2), (32, 256, 3)):
        for frac_log2 in (0, 1, 2):
            tq, tmax = [], []
            for rep in range(reps):
                q = jax.random.uniform(
                    jax.random.fold_in(key, 100 + rep), (rows, k),
                    jnp.float32)
                quals, cmax = jax.device_get(
                    row_stats(q, frac_log2, kk, cell))
                tq.append(quals)
                tmax.append(cmax)
            tq = np.concatenate(tq)
            tmax = np.concatenate(tmax)
            p_row = float((tmax > solvable).mean())
            p_batch = 1.0 - (1.0 - p_row) ** 1024
            print(f"K={kk:3d} cell={cell} prefix=1/{1 << frac_log2}: "
                  f"E[quals]={tq.mean():7.1f} max={tq.max():5d} "
                  f"P(row cell>{solvable})={p_row:.5f} "
                  f"P(batch fallback)~{p_batch:.3f}", flush=True)


if __name__ == "__main__":
    main()
