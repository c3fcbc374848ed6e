"""Zoom into round 5, row 37, cell 6419: dump raw moments, packed-key
slot contents, and the solved lanes. Run: python scripts/r6_rounds_debug3.py"""
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
    nc = n_ops // 128
    pw = nc // 4

    @jax.jit
    def upto_round5(search, r_ops):
        lo = jnp.full((m, 1), -jnp.inf, jnp.float32)
        b_first = jnp.full((m, 1), -1, jnp.int32)
        b_strict = jnp.full((m, 1), T._I32_MAX, jnp.int32)
        for r in range(6):
            _i1, cs1 = pass1(search, r_ops, lo,
                             b_first if r == 0 else b_strict)
            bound = jax.lax.sort(cs1, dimension=-1)[:, 63:64]
            bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
            bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
            bound = jnp.maximum(bound, lo)
            if r < 5:
                lo = bound
        moms = extract(search, r_ops, bound, lo)
        return moms, lo, bound

    moms, lo, bound = upto_round5(q_t, (r_op,))
    cnt, suml, sumsq, sumcu = [np.asarray(jax.device_get(x[37]))
                               for x in moms]
    cell = 6419
    print("cell moments: cnt", cnt[cell], "suml", suml[cell],
          "sumsq", sumsq[cell], "p3", sumcu[cell], flush=True)
    # solve by hand
    e1 = int(suml[cell]); p2 = int(sumsq[cell]); p3 = int(sumcu[cell])
    import itertools
    sols = [c for c in itertools.combinations(range(128), 3)
            if sum(c) == e1 and sum(x*x for x in c) == p2
            and sum(x**3 for x in c) == p3]
    print("brute-force lanes:", sols, flush=True)
    # packed key contents for that cell
    part = cell // pw
    r_loc = cell % pw
    rank = pw - 1 - r_loc
    k1 = ((1 << 30) | (rank << 18)
          | ((p3 >> 17) << 12) | (e1 << 3) | min(int(cnt[cell]), 7))
    print(f"part {part} r_loc {r_loc} rank {rank} key1 {k1:#x}",
          flush=True)
    # per-part qualifier count in this round for row 37
    qual = cnt > 0
    pq = qual.reshape(4, pw).sum(axis=1)
    print("row-37 round-5 per-part qualifying cells:", pq, flush=True)
    # where does this cell's rank sit among part-3 qualifiers?
    part_cells = np.nonzero(qual[part * pw:(part + 1) * pw])[0]
    print(f"part {part} qualifying cells (r_loc): {part_cells}",
          flush=True)


if __name__ == "__main__":
    main()
