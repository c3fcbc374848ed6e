"""r15: per-stage profile of the seeded batch top-K engine (VERDICT r3
item 1 — close the gap to the ~2-reads-per-64-results floor).

Measures, at (m=1024, k=16, n=2^20) with prepared operands:
  - anchors: prepared 1-NN candidates pass, end-to-end seeded engine at
    K in {8,16,32,64} and the 2-round K=128 engine;
  - pass 1: current lex-banded (value+index fold) vs the new VALUE-ONLY
    minima kernel (_build_minima_candidates) at the same tiles;
  - extraction: 4-field K<=16 geometry; 8-field K=64 geometry at
    tile_n in {4096, 2048, 1024} x tile_m in {256, 512} — at 2048 the
    moment matmul halves (cols 256 -> 128);
  - compaction (Pallas positional) at the K=16 and K=64 geometries;
  - rerank split: gather+d2 vs the (d2, idx) 2-key sort at widths 96
    (K=16) and 576 (K=64), plus narrower sort widths.

Run on the real chip: python scripts/r15_profile_seeded.py

HISTORICAL (r4): the compaction/moment sections predate the packed
extraction contract (moments() now returns in-kernel-packed (A[, p3])
instead of raw digit arrays) and will not run unmodified; kept as the
measurement record behind PERF_NOTES "Round-4". Current anchors:
scripts/r17_seeded_anchors.py; stage isolation: r17_compact_iso.py,
r18_cum_profile.py.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import (
    _build_banded_candidates, _build_minima_candidates, auto_precision,
    pick_tiles,
)
from tpu_knn.kernels import topk as T

M, K_DIM, N = 1024, 16, 1 << 20


def consume_rows(c, *outs):
    """Fold a reduction over every output row into the carry (DCE rule)."""
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    key = jax.random.PRNGKey(15)
    q = jax.random.uniform(jax.random.fold_in(key, 1), (M, K_DIM))
    r = jax.random.uniform(jax.random.fold_in(key, 2), (N, K_DIM))
    prec = auto_precision(K_DIM, N)
    n_ops = N
    print(f"precision={prec}", flush=True)

    # ---- prepared operands (built once, like NNIndex) ----
    p1_tm, p1_tn = pick_tiles(K_DIM, M, N, wide=prec == "packed")
    banded = _build_banded_candidates(M, N, K_DIM, p1_tm, p1_tn, prec,
                                      n_ops=n_ops)
    r_ops = tuple(jax.device_put(o) for o in banded.prep_soa(r))
    ref_aos = jax.device_put(r)
    print(f"p1 tiles: ({p1_tm}, {p1_tn})", flush=True)

    # ---- anchors: end-to-end engines ----
    for kk in (8, 16, 32, 64, 128):
        run = T._build_topk(M, N, K_DIM, kk, n_ops, prec, "seeded")

        def step(i, c, q, *ops):
            eps = i.astype(jnp.float32) * 1e-9
            ii, dd = run(q + eps, ops[:-1], ops[-1])
            return consume_rows(c, ii, dd)

        ms, it = calibrated_amplified_ms(step, q, *r_ops, ref_aos)
        print(f"end-to-end seeded K={kk}: {ms:.3f} ms (x{it})", flush=True)

    # ---- pass 1 variants ----
    nb_s = jnp.full((M, 1), -jnp.inf, jnp.float32)
    nb_i = jnp.full((M, 1), -1, jnp.int32)

    def step_banded(i, c, q, *ops):
        eps = i.astype(jnp.float32) * 1e-9
        ci, cs = banded(q + eps, ops, nb_s, nb_i)
        return consume_rows(c, ci, cs)

    ms, it = calibrated_amplified_ms(step_banded, q, *r_ops)
    print(f"pass1 banded ({p1_tm},{p1_tn}): {ms:.3f} ms (x{it})", flush=True)

    for tm, tn in [(p1_tm, p1_tn), (256, 8192), (512, 8192)]:
        try:
            mins = _build_minima_candidates(M, N, K_DIM, tm, tn, prec,
                                            n_ops=n_ops)

            def step_min(i, c, q, *ops):
                eps = i.astype(jnp.float32) * 1e-9
                cs = mins(q + eps, ops)
                return consume_rows(c, cs)

            ms, it = calibrated_amplified_ms(step_min, q, *r_ops)
            print(f"pass1 minima ({tm},{tn}): {ms:.3f} ms (x{it})",
                  flush=True)
        except Exception as e:
            print(f"pass1 minima ({tm},{tn}): FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # the bound itself (sort of (m, 128) + inflate)
    cs1 = banded(q, r_ops, nb_s, nb_i)[1]

    def step_bound(i, c, cs1):
        b = jax.lax.sort(cs1 + i.astype(jnp.float32) * 1e-9,
                         dimension=-1)[:, 15:16]
        return consume_rows(c, T._inflate_bound(b))

    ms, it = calibrated_amplified_ms(step_bound, cs1)
    print(f"bound sort (m,128): {ms:.3f} ms (x{it})", flush=True)

    # ---- extraction geometries ----
    bound16 = T._inflate_bound(jax.lax.sort(cs1, dimension=-1)[:, 15:16])
    bound64 = T._inflate_bound(jax.lax.sort(cs1, dimension=-1)[:, 63:64])
    ext_cases = [("4-field K16 (256,8192)", 256, 8192, 16),
                 ("4-field K16 (256,4096)", 256, 4096, 16),
                 ("8-field K64 (256,4096)", 256, 4096, 64),
                 ("8-field K64 (256,2048)", 256, 2048, 64),
                 ("8-field K64 (512,2048)", 512, 2048, 64),
                 ("8-field K64 (256,1024)", 256, 1024, 64),
                 ("8-field K32 (256,4096)", 256, 4096, 32),
                 ("8-field K32 (256,2048)", 256, 2048, 32)]
    for label, tm, tn, kk in ext_cases:
        try:
            ext = T._build_extract_candidates(M, N, K_DIM, tm, tn, prec,
                                              n_ops=n_ops, kk=kk)
            bnd = bound16 if kk <= 16 else bound64

            def step_ext(i, c, q, bnd, *ops):
                eps = i.astype(jnp.float32) * 1e-9
                moms = ext(q + eps, ops, bnd)
                return consume_rows(c, moms[0])

            ms, it = calibrated_amplified_ms(step_ext, q, bnd, *r_ops)
            print(f"extract {label} cell={ext.cell}: {ms:.3f} ms (x{it})",
                  flush=True)
        except Exception as e:
            print(f"extract {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # ---- compaction + solve at real densities ----
    ext16 = T._build_extract_candidates(M, N, K_DIM, 256, 8192, prec,
                                        n_ops=n_ops, kk=16)
    ext64 = T._build_extract_candidates(M, N, K_DIM, 256, 4096, prec,
                                        n_ops=n_ops, kk=64)
    for label, ext, bnd, parts, cap in [
            ("K16 (nc=4096, 1x48)", ext16, bound16, 1, 48),
            ("K64 (nc=8192, 4x48)", ext64, bound64, 4, 48)]:
        moms = ext(q, r_ops, bnd)
        cnt = moms[0]
        qmax = int(jnp.max(jnp.sum(cnt > 0, axis=1)))
        cmax = int(jnp.max(cnt))
        print(f"{label}: max quals/row {qmax}, max cell cnt {cmax}",
              flush=True)
        a_pack = (jnp.minimum(cnt, 3)
                  | (moms[1].astype(jnp.int32) << 2)
                  | (moms[2].astype(jnp.int32) << 12))
        fields = (a_pack,) if ext.solvable == 2 else (
            a_pack, moms[3].astype(jnp.int32))
        nc = a_pack.shape[1]

        def step_cs2(i, c, *fs):
            fs = tuple(jnp.roll(f, i, axis=0) for f in fs)
            cols, _v, ok = T._compact_and_solve(
                M, nc, parts, cap, fs, cell=ext.cell, n=N,
                solvable=ext.solvable)
            return consume_rows(c, cols, ok.astype(jnp.int32))

        ms, it = calibrated_amplified_ms(step_cs2, *fields)
        print(f"compact+solve {label}: {ms:.3f} ms (x{it}) "
              "(incl. row-roll perturb)", flush=True)
        cols, _v, _ok = T._compact_and_solve(
            M, nc, parts, cap, fields, cell=ext.cell, n=N,
            solvable=ext.solvable)
        w = cols.shape[1]

        # rerank split at this width
        def step_rr(i, c, q, cols, ref_aos):
            eps = i.astype(jnp.float32) * 1e-9
            ii, dd = T._exact_rerank(q + eps, ref_aos,
                                     cols, 16 if parts == 1 else 64, N)
            return consume_rows(c, ii, dd)

        ms, it = calibrated_amplified_ms(step_rr, q, cols, ref_aos)
        print(f"rerank width {w}: {ms:.3f} ms (x{it})", flush=True)

        # gather+d2 only (no sort)
        def step_gd(i, c, q, cols, ref_aos):
            eps = i.astype(jnp.float32) * 1e-9
            in_range = cols < N
            safe = jnp.where(in_range, cols, 0)
            pts = jnp.take(ref_aos, safe.reshape(-1), axis=0)
            pts = pts.reshape(cols.shape[0], -1, ref_aos.shape[1])
            diff = (q + eps)[:, None, :] - pts
            d2 = jnp.where(in_range, jnp.sum(diff * diff, axis=-1),
                           jnp.inf)
            return consume_rows(c, d2)

        ms, it = calibrated_amplified_ms(step_gd, q, cols, ref_aos)
        print(f"  gather+d2 width {w}: {ms:.3f} ms (x{it})", flush=True)

    # ---- sort cost vs width and key count ----
    rng = np.random.default_rng(0)
    for w in (96, 224, 320, 576, 1152):
        d2 = jnp.asarray(rng.random((M, w), np.float32))
        ci = jnp.asarray(rng.integers(0, N, (M, w)).astype(np.int32))

        def step_s2(i, c, d2, ci):
            eps = i.astype(jnp.float32) * 1e-9
            a, b = jax.lax.sort((d2 + eps, ci), dimension=-1, num_keys=2)
            return consume_rows(c, a, b)

        ms, it = calibrated_amplified_ms(step_s2, d2, ci)

        def step_s1(i, c, d2, ci):
            eps = i.astype(jnp.float32) * 1e-9
            a, b = jax.lax.sort((d2 + eps, ci), dimension=-1, num_keys=1)
            return consume_rows(c, a, b)

        ms1, it1 = calibrated_amplified_ms(step_s1, d2, ci)
        print(f"sort (m,{w}): 2-key {ms:.3f} ms (x{it}), "
              f"1-key+payload {ms1:.3f} ms (x{it1})", flush=True)


if __name__ == "__main__":
    main()
