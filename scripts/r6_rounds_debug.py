"""Diagnose the K=512 multi-round misses: duplicates in si? sentinels?
which ranks/rows? Run: python scripts/r6_rounds_debug.py [K]"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.kernels.fused import auto_precision
from tpu_knn.kernels.topk import _build_topk
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up


def main():
    kk = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    m, n, k = 1024, 1 << 20, 16
    key = jax.random.PRNGKey(7)
    r_t = jax.random.uniform(jax.random.fold_in(key, 1), (n, k),
                             jnp.float32)
    q_t = jax.random.uniform(jax.random.fold_in(key, 2), (m, k),
                             jnp.float32)
    prec = auto_precision(k, n)
    tile_n = pick_tiles(k, m, n)[1]
    n_ops = round_up(n, tile_n)
    k_pad = round_up(k, 8)
    r_op = jnp.pad(r_t, ((0, n_ops - n), (0, k_pad - k))).T
    seeded = _build_topk(m, n, k, kk, n_ops, prec, "seeded")
    si, sd = seeded(q_t, (r_op,), r_t)

    @jax.jit
    def exact_row(q):
        diff = r_t - q[None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        return jax.lax.sort(d2)[:kk]

    gold = jax.lax.map(exact_row, q_t, batch_size=16)
    bad = jnp.abs(sd - gold) > 1e-5 * jnp.maximum(gold, 1.0)
    si_h = np.asarray(jax.device_get(si))
    sd_h = np.asarray(jax.device_get(sd))
    g_h = np.asarray(jax.device_get(gold))
    bad_h = np.asarray(jax.device_get(bad))
    rows = np.unique(np.nonzero(bad_h)[0])
    print(f"bad entries {bad_h.sum()}, rows {rows[:12]}...", flush=True)
    print("sentinels(-1) in si:", int((si_h < 0).sum()), flush=True)
    srt = np.sort(si_h, axis=1)
    dups = int((srt[:, 1:] == srt[:, :-1]).sum())
    print("duplicate indices within rows:", dups, flush=True)
    for row in rows[:4]:
        cols = np.nonzero(bad_h[row])[0]
        print(f"row {row}: bad ranks {cols[:10]} of {kk}; "
              f"sd {sd_h[row, cols[:3]]}, gold {g_h[row, cols[:3]]}",
              flush=True)
        # duplicates in this row?
        s = np.sort(si_h[row])
        d = s[1:][s[1:] == s[:-1]]
        print(f"  row-dups: {d[:5]}", flush=True)


if __name__ == "__main__":
    main()
