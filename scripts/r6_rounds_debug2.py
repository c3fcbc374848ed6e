"""Pinpoint the K=512 single-element miss: which round owns the missing
element's score band, what its cell's cnt was, whether the cell was
compacted, and whether its recovered lanes include it.

Run: python scripts/r6_rounds_debug2.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import tpu_knn.kernels.topk as T
from tpu_knn.kernels.fused import auto_precision, pick_tiles
from tpu_knn.utils.shapes import round_up


def main():
    m, n, k, kk = 1024, 1 << 20, 16, 512
    key = jax.random.PRNGKey(7)
    r_t = jax.random.uniform(jax.random.fold_in(key, 1), (n, k),
                             jnp.float32)
    q_t = jax.random.uniform(jax.random.fold_in(key, 2), (m, k),
                             jnp.float32)
    prec = auto_precision(k, n)
    tile_n_sel = T.pick_tiles(k, m, n)[1]
    n_ops = round_up(n, tile_n_sel)
    k_pad = round_up(k, 8)
    r_op = jnp.pad(r_t, ((0, n_ops - n), (0, k_pad - k))).T

    # ---- the real engine's outputs
    seeded = T._build_topk(m, n, k, kk, n_ops, prec, "seeded")
    si, sd = seeded(q_t, (r_op,), r_t)
    si_h = np.asarray(jax.device_get(si))

    # ---- exact oracle for row 37
    row = 37
    q37 = q_t[row]
    diff = r_t - q37[None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    order = np.asarray(jax.device_get(jnp.argsort(d2)))
    gold_idx = order[:kk]
    missing = sorted(set(gold_idx.tolist()) - set(si_h[row].tolist()))
    print("missing columns:", missing, flush=True)
    if not missing:
        return
    mc = missing[0]
    print("missing col", mc, "cell", mc // 128, "lane", mc % 128,
          "exact d2", float(d2[mc]), flush=True)

    # ---- rebuild the round machinery with debug outputs
    tile_m = min(256, round_up(m, 8))
    t = 128
    while t * 2 <= min(4096, n_ops) and n_ops % (t * 2) == 0:
        t *= 2
    extract = T._build_extract_candidates(m, n, k, tile_m, t, prec,
                                          n_ops=n_ops,
                                          kk=T.SEEDED_ROUND_K,
                                          banded=True)
    p1m, p1n = pick_tiles(k, m, n, wide=prec == "packed")
    p1n = min(p1n, n_ops)
    while n_ops % p1n != 0:
        p1n -= 128
    pass1 = T._build_banded_candidates(m, n, k, p1m, p1n, prec,
                                       n_ops=n_ops)
    solvable = extract.solvable
    rounds = -(-kk // T.SEEDED_ROUND_K)

    @jax.jit
    def debug(search, r_ops):
        lo = jnp.full((m, 1), -jnp.inf, jnp.float32)
        b_first = jnp.full((m, 1), -1, jnp.int32)
        b_strict = jnp.full((m, 1), T._I32_MAX, jnp.int32)
        bounds, cnts, counted = [], [], jnp.zeros((m,), jnp.int32)
        for r in range(rounds):
            _i1, cs1 = pass1(search, r_ops, lo,
                             b_first if r == 0 else b_strict)
            bound = jax.lax.sort(cs1, dimension=-1)[:, 63:64]
            bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
            bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
            bound = jnp.maximum(bound, lo)
            moms = extract(search, r_ops, bound, lo)
            cnt = moms[0]
            counted += jnp.sum(jnp.minimum(cnt, solvable), axis=1)
            bounds.append(bound[:, 0])
            cnts.append(cnt)
            lo = bound
        return bounds, cnts, counted

    bounds, cnts, counted = debug(q_t, (r_op,))
    cell_id = mc // 128
    print("counted[row] =", int(counted[row]), "(needs >= 512)",
          flush=True)
    for r in range(rounds):
        b = float(bounds[r][row])
        c = int(cnts[r][row, cell_id])
        tot = int(jnp.sum(cnts[r][row]))
        print(f"round {r}: bound {b:.7f}  cnt[cell {cell_id}] = {c}  "
              f"row qualifiers {tot}", flush=True)
    # which si entries come from this cell?
    incell = [c for c in si_h[row] if c // 128 == cell_id]
    print("recovered cols from that cell:", incell, flush=True)
    print("exact d2 of cell's lanes in gold set:",
          [(c, float(d2[c])) for c in gold_idx if c // 128 == cell_id],
          flush=True)


if __name__ == "__main__":
    main()
