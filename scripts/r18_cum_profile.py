"""r18: cumulative truncated-pipeline profile of the seeded K=64 engine
at (m=1024, k=16, n=2^20) — the stage-sum (≈9.6 ms) vs end-to-end
(12.8 ms) discrepancy means ~3 ms lives between the isolated-stage
numbers; time PREFIXES of the real pipeline to localize it.

Run on the real chip: python scripts/r18_cum_profile.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import (
    _build_banded_candidates, _build_minima_candidates, auto_precision,
    pick_tiles,
)
from tpu_knn.kernels import topk as T

M, K_DIM, N = 1024, 16, 1 << 20
KK = 64


def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    key = jax.random.PRNGKey(18)
    q = jax.random.uniform(jax.random.fold_in(key, 1), (M, K_DIM))
    r = jax.random.uniform(jax.random.fold_in(key, 2), (N, K_DIM))
    prec = auto_precision(K_DIM, N)
    p1_tm, p1_tn = pick_tiles(K_DIM, M, N, wide=prec == "packed")
    banded = _build_banded_candidates(M, N, K_DIM, p1_tm, p1_tn, prec,
                                      n_ops=N)
    r_ops = tuple(jax.device_put(o) for o in banded.prep_soa(r))
    ref_aos = jax.device_put(r)

    tile_m = min(T.EXTRACT_TILE_M, M)
    tile_n = T._extract_tile_n(N, T.EXTRACT_TILE_N_CUBIC, K_DIM)
    extract = T._build_extract_candidates(M, N, K_DIM, tile_m, tile_n,
                                          prec, n_ops=N, kk=KK)
    pass1 = _build_minima_candidates(M, N, K_DIM, p1_tm, p1_tn, prec,
                                     n_ops=N)
    cell, solvable = extract.cell, extract.solvable
    nc = N // cell
    cap_full = min(nc, 2 * KK + 16)
    nparts = 4
    pw = nc // nparts
    cap_fast = 48
    print(f"tile=({tile_m},{tile_n}) cell={cell} nc={nc}", flush=True)

    def upto(stage):
        def fn(search, r_ops):
            c = jnp.float32(0)
            cs1 = pass1(search, r_ops)
            bound = jax.lax.sort(cs1, dimension=-1)[:, KK - 1:KK]
            bound = T._inflate_bound(bound)
            if stage == "p1":
                return consume(c, cs1, bound)
            moms = extract(search, r_ops, bound)
            if stage == "extract":
                return consume(c, *moms)
            cnt = moms[0]
            qual = cnt > 0
            qual_rows = jnp.sum(qual, axis=1)
            a_pack = (jnp.minimum(cnt, 3)
                      | (moms[1].astype(jnp.int32) << 2)
                      | (moms[2].astype(jnp.int32) << 12))
            fields = (a_pack,) if solvable == 2 else (a_pack, moms[3])
            part_q = jnp.sum(qual.reshape(M, nparts, pw), axis=2)
            cert_common = ((jnp.max(cnt) <= solvable)
                           & jnp.all(jnp.sum(jnp.minimum(cnt, solvable),
                                             axis=1) >= KK))
            fast_fits = jnp.all(part_q <= min(cap_fast, pw))
            if stage == "apack":
                return consume(c, *fields, qual_rows, part_q,
                               cert_common.astype(jnp.int32),
                               fast_fits.astype(jnp.int32))
            comp = T._build_cell_compactor(
                M, nc, nparts, cap_fast, len(fields),
                tile_m=min(128, M))
            outs = comp(*fields)
            if stage == "compact":
                return consume(c, *outs, cert_common.astype(jnp.int32),
                               fast_fits.astype(jnp.int32))
            cols, _valid, rec_ok = T._compact_and_solve(
                M, nc, nparts, cap_fast, fields, cell=cell, n=N,
                solvable=solvable)
            if stage == "solve":
                return consume(c, cols, rec_ok.astype(jnp.int32),
                               cert_common.astype(jnp.int32),
                               fast_fits.astype(jnp.int32))
            if cols.shape[1] > 256:
                cols, okc = T._compact_cols(cols, N)
                rec_ok = rec_ok & okc
            if stage == "narrow":
                return consume(c, cols, rec_ok.astype(jnp.int32),
                               cert_common.astype(jnp.int32),
                               fast_fits.astype(jnp.int32))
            idx_k, d2_k = T._exact_rerank(search, ref_aos, cols, KK, N)
            return consume(c, idx_k, d2_k, rec_ok.astype(jnp.int32),
                           cert_common.astype(jnp.int32),
                           fast_fits.astype(jnp.int32))
        return fn

    prev = 0.0
    for stage in ("p1", "extract", "apack", "compact", "solve",
                  "narrow", "rerank"):
        fn = upto(stage)

        def step(i, c, q, *ops):
            eps = i.astype(jnp.float32) * 1e-9
            return c + fn(q + eps, ops)

        ms, it = calibrated_amplified_ms(step, q, *r_ops)
        print(f"upto {stage}: {ms:.3f} ms (x{it})  [+{ms - prev:.3f}]",
              flush=True)
        prev = ms

    run = T._build_topk.__wrapped__(M, N, K_DIM, KK, N, prec, "seeded")

    def stepf(i, c, q, *ops):
        eps = i.astype(jnp.float32) * 1e-9
        ii, dd = run(q + eps, ops[:-1], ops[-1])
        return consume(c, ii, dd)

    ms, it = calibrated_amplified_ms(stepf, q, *r_ops, ref_aos)
    print(f"full engine: {ms:.3f} ms (x{it})  [+{ms - prev:.3f} "
          "= cond/escalation/fallback structure]", flush=True)


if __name__ == "__main__":
    main()
