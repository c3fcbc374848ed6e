"""r23: cumulative decomposition of the seeded QUADRATIC top-K path
(VERDICT r4 items 3+4) at (m=1024, n=2^20), K=16, for k in {16, 128,
768} — where does the 2.3-3x top-16 multiplier live at wide k, and
what does the quad extraction's 3.3 ms buy at k=16?

Also emulates the PREFIX-HALF pass 1: the K-th smallest per-lane
minimum over any SUBSET of the reference is still a valid upper bound
on the global K-th score (subset K-th >= global K-th), so pass 1 can
read half the operand — at the cost of a looser bound (more
qualifiers). Stages measure both the cost saved and the qualifier
census inflation.

Run on the real chip: python scripts/r23_topk_decomp.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import auto_precision, pick_tiles
from tpu_knn.kernels import topk as T
from tpu_knn.kernels.fused import _build_minima_candidates

M, N = 1024, 1 << 20
KK = 16


def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c


def profile(k_dim):
    key = jax.random.PRNGKey(23 + k_dim)
    q = jax.random.uniform(jax.random.fold_in(key, 1), (M, k_dim))
    r = jax.random.uniform(jax.random.fold_in(key, 2), (N, k_dim))
    prec = auto_precision(k_dim, N)
    p1_tm, p1_tn = pick_tiles(k_dim, M, N, wide=prec == "packed")
    p1_tn = min(p1_tn, N)
    while N % p1_tn:
        p1_tn -= 128
    tile_m = min(T.EXTRACT_TILE_M, M)
    tile_n = T._extract_tile_n(N, T.EXTRACT_TILE_N_QUAD, k_dim)
    extract = T._build_extract_candidates(M, N, k_dim, tile_m, tile_n,
                                          prec, n_ops=N, kk=KK)
    pass1 = _build_minima_candidates(M, N, k_dim, p1_tm, p1_tn, prec,
                                     n_ops=N)
    # prefix-half pass 1: same builder over an n/2 operand
    pass1h = _build_minima_candidates(M, N // 2, k_dim, p1_tm,
                                      min(p1_tn, N // 2), prec,
                                      n_ops=N // 2)
    cell, solvable = extract.cell, extract.solvable
    nc = N // cell
    cap_fast = min(nc, 2 * KK + 16, 48)
    print(f"\n== k={k_dim} prec={prec} cell={cell} nc={nc} "
          f"p1 tiles ({p1_tm},{p1_tn}) ext ({tile_m},{tile_n}) ==",
          flush=True)
    run_full = T._build_topk.__wrapped__(M, N, k_dim, KK, N, prec,
                                         "seeded")

    ops_full = tuple(jax.device_put(o)
                     for o in extract.prep_soa(r))
    ops_half = tuple(jax.device_put(o[..., : o.shape[-1] // 2])
                     for o in ops_full)
    ref_aos = jax.device_put(r)

    def upto(stage, half):
        def fn(search, ops, opsh):
            c = jnp.float32(0)
            if half:
                cs1 = pass1h(search, opsh)
            else:
                cs1 = pass1(search, ops)
            bound = jax.lax.sort(cs1, dimension=-1)[:, KK - 1:KK]
            bound = T._inflate_bound(bound)
            if stage == "p1":
                return consume(c, cs1, bound)
            moms = extract(search, ops, bound)
            a_pack = moms[0]
            if stage == "extract":
                return consume(c, a_pack)
            qual = a_pack != 0
            qual_rows = jnp.sum(qual, axis=1)
            if stage == "census":
                return consume(c, qual_rows.astype(jnp.float32).max(),
                               qual_rows.astype(jnp.float32).sum())
            cols, _valid, rec_ok = T._compact_and_solve(
                M, nc, 1, cap_fast, (a_pack,), cell=cell, n=N,
                solvable=solvable)
            if stage == "recover":
                return consume(c, cols, rec_ok.astype(jnp.int32))
            idx_k, d2_k = T._exact_rerank(search, ref_aos, cols, KK, N)
            return consume(c, idx_k, d2_k, rec_ok.astype(jnp.int32))
        return fn

    for half in (False, True):
        tag = "prefix-half" if half else "full-pass1"
        prev = 0.0
        for stage in ("p1", "extract", "census", "recover", "rerank"):
            fn = upto(stage, half)

            def step(i, c, q, *ops):
                eps = i.astype(jnp.float32) * 1e-9
                nf = len(ops_full)
                return c + fn(q + eps, ops[:nf], ops[nf:])

            ms, it = calibrated_amplified_ms(step, q, *ops_full,
                                             *ops_half, max_iters=256)
            print(f"  [{tag}] upto {stage}: {ms:7.3f} ms (x{it}) "
                  f"[+{ms - prev:.3f}]", flush=True)
            prev = ms
        # qualifier census under this bound (host check, not timed)
        fn = upto("census", half)
        cs1 = (pass1h(q, ops_half) if half else pass1(q, ops_full))
        bound = T._inflate_bound(
            jax.lax.sort(cs1, dimension=-1)[:, KK - 1:KK])
        a_pack = extract(q, ops_full, bound)[0]
        qual_rows = np.asarray(jax.device_get((a_pack != 0).sum(1)))
        over = int((qual_rows > cap_fast).sum())
        print(f"  [{tag}] census: max {qual_rows.max()} mean "
              f"{qual_rows.mean():.1f} rows>{cap_fast}: {over}/1024",
              flush=True)

    def stepf(i, c, q, *ops):
        eps = i.astype(jnp.float32) * 1e-9
        ii, dd = run_full(q + eps, ops[:len(ops_full)], ref_aos)
        return consume(c, ii, dd)

    ms, it = calibrated_amplified_ms(stepf, q, *ops_full, *ops_half,
                                     max_iters=256)
    print(f"  full engine: {ms:.3f} ms (x{it})", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for k_dim in (16, 128, 768):
        profile(k_dim)


if __name__ == "__main__":
    main()
