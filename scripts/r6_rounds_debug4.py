"""Replicate _build_seeded_rounds' run exactly, but dump per-round cols
for row 37 and check whether 821643 survives each stage.

Run: python scripts/r6_rounds_debug4.py
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
    prec = auto_precision(k, m and n)
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
    cell = extract.cell
    solvable = extract.solvable
    nc = n_ops // cell
    cap_full = min(nc, 2 * T.SEEDED_ROUND_K + 16)
    nparts = 4
    pw = nc // nparts
    cap_fast = min(48, pw)
    width = solvable * max(nparts * cap_fast, cap_full)
    rounds = -(-kk // T.SEEDED_ROUND_K)

    def one_round(search, r_ops, lo, b_i):
        _i1, cs1 = pass1(search, r_ops, lo, b_i)
        bound = jax.lax.sort(cs1, dimension=-1)[:, 63:64]
        bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
        bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
        bound = jnp.maximum(bound, lo)
        moms = extract(search, r_ops, bound, lo)
        cnt, suml, sumsq, sumcu = moms
        qual = cnt > 0
        r_iota = (jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1)
                  % pw)
        head = jnp.where(qual, (1 << 30) | ((pw - 1 - r_iota) << 18), 0)
        suml_i = suml.astype(jnp.int32)
        sumsq_i = sumsq.astype(jnp.int32)
        keys = [head | jnp.where(
                    qual,
                    ((sumcu >> 17) << 12) | (suml_i << 3)
                    | jnp.minimum(cnt, 7), 0),
                head | jnp.where(
                    qual, (((sumcu >> 15) & 3) << 16) | sumsq_i, 0),
                head | jnp.where(qual, sumcu & 0x7FFF, 0)]

        def compact(kq):
            ps = [jax.lax.top_k(kq[:, p * pw:(p + 1) * pw],
                                cap_fast)[0]
                  for p in range(nparts)]
            return jnp.concatenate(ps, axis=1)

        outs = [compact(kq) for kq in keys]
        a = outs[0]
        valid = a >= (1 << 30)
        local = pw - 1 - ((a >> 18) & 0xFFF)
        off = jnp.concatenate(
            [jnp.full((m, cap_fast), p * pw, jnp.int32)
             for p in range(nparts)], axis=1)
        cellc = jnp.where(valid, local + off, 0)
        c_cnt = a & 7
        e1 = (a >> 3) & 0x1FF
        p2 = outs[1] & 0xFFFF
        p3 = ((((a >> 12) & 0x3F) << 17)
              | (((outs[1] >> 16) & 3) << 15) | (outs[2] & 0x7FFF))
        cols, rec_ok = T._solve_cells(cellc, valid, c_cnt, e1, p2, p3,
                                      cell=cell, n=n, solvable=solvable)
        cols = jnp.pad(cols, ((0, 0), (0, width - cols.shape[1])),
                       constant_values=n)
        if nparts > 1:
            part_q = jnp.sum(qual.reshape(m, nparts, pw), axis=2)
            fast_fits = jnp.all(part_q <= cap_fast)
        else:
            fast_fits = jnp.all(jnp.sum(qual, axis=1) <= cap_fast)
        return cols, rec_ok, fast_fits, bound

    @jax.jit
    def run(search, r_ops):
        lo = jnp.full((m, 1), -jnp.inf, jnp.float32)
        b_first = jnp.full((m, 1), -1, jnp.int32)
        b_strict = jnp.full((m, 1), T._I32_MAX, jnp.int32)
        all_cols, fits, oks = [], [], []
        for r in range(rounds):
            cols_r, ok_r, fit_r, bound = one_round(
                search, r_ops, lo, b_first if r == 0 else b_strict)
            all_cols.append(cols_r)
            fits.append(fit_r)
            oks.append(ok_r)
            lo = bound
        return all_cols, fits, oks

    all_cols, fits, oks = run(q_t, (r_op,))
    print("fast_fits per round:", [bool(f) for f in fits], flush=True)
    print("rec_ok per round:", [bool(o) for o in oks], flush=True)
    for r in range(rounds):
        c = np.asarray(jax.device_get(all_cols[r][37]))
        hit = 821643 in c.tolist()
        incell = [x for x in c.tolist() if 0 <= x < n and x // 128 == 6419]
        print(f"round {r}: 821643 in cols? {hit}; cell-6419 cols {incell}",
              flush=True)


if __name__ == "__main__":
    main()
