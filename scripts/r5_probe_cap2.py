"""Round-3 TPU probe #12b: K=32 seeded-engine endgame — cap sizing and
compaction-op mix.

r5_probe_packed: payload-packed top_k compaction gives K=8 6.85 /
K=16 7.12 (geo 8192) and K=32 14.95 (geo 4096; 16.36 at 8192). K=32's
residual: 4 top_k calls at cap=80 + width-240 gather/sort. This probe:

  1. qualifier statistics at K=16/32 over 64 perturbed reps (max
     qualifying cells per row, max cell count) — sizes cap against the
     certified-fallback trip rate;
  2. composed K=32 variants at geo (256,4096):
       4topk-cap80 (probe #11's winner), 4topk-cap48,
       mix-cap80 / mix-cap48 (1 top_k + 2 packed int32 gathers);
  3. extraction geometry P2 at (384,4096) and (512,4096), 8-field.

Run alone: python scripts/r5_probe_cap.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.topk import (
    _build_banded_candidates, _build_extract_candidates, _build_topk,
    _I32_MAX,
)
from tpu_knn.kernels.fused import pick_tiles
from tpu_knn.utils.shapes import round_up
from scripts.r5_probe_packed import newton_max_root


def build_v(m, n, k, kk, n_ops, cap, mix, tile_geo, precision="packed"):
    tile_m, tile_n = tile_geo
    extract = _build_extract_candidates(m, n, k, tile_m, tile_n, precision,
                                        n_ops=n_ops, kk=kk)
    p1_tile_m, p1_tile_n = pick_tiles(k, m, n, wide=True)
    p1_tile_n = min(p1_tile_n, n_ops)
    while n_ops % p1_tile_n != 0:
        p1_tile_n -= 128
    pass1 = _build_banded_candidates(m, n, k, p1_tile_m, p1_tile_n,
                                     precision, n_ops=n_ops)
    cell = extract.cell
    solvable = extract.solvable
    nc = n_ops // cell
    cap = min(nc, cap)

    @jax.jit
    def run(search, r_ops, ref_aos):
        no_band_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
        no_band_i = jnp.full((m, 1), -1, jnp.int32)
        _i1, cs1 = pass1(search, r_ops, no_band_s, no_band_i)
        bound = jax.lax.sort(cs1, dimension=-1)[:, kk - 1:kk]
        bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
        bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
        moms = extract(search, r_ops, bound)
        cnt = moms[0]
        qual = cnt > 0
        rank = (nc - 1
                - jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1))
        head = jnp.where(qual, (1 << 30) | (rank << 18), 0)
        suml_i = moms[1].astype(jnp.int32)
        sumsq_i = moms[2].astype(jnp.int32)
        p3i = moms[3]
        keyA = head | jnp.where(qual,
                                (suml_i << 3) | jnp.minimum(cnt, 7), 0)
        a, _ = jax.lax.top_k(keyA, cap)
        valid = a >= (1 << 30)
        cellc = jnp.where(valid, nc - 1 - ((a >> 18) & 0xFFF), 0)
        c_cnt = a & 7
        e1 = (a >> 3) & 0x7FFF
        if mix:
            # sumsq(18) | p3hi(13) in one int32, p3lo(13) in another
            g1 = jnp.where(qual, (sumsq_i << 13) | (p3i >> 13), 0)
            g2 = jnp.where(qual, p3i & 0x1FFF, 0)
            t1 = jnp.take_along_axis(g1, cellc, axis=1)
            t2 = jnp.take_along_axis(g2, cellc, axis=1)
            p2 = (t1 >> 13) & 0x3FFFF
            p3 = ((t1 & 0x1FFF) << 13) | t2
        else:
            keyB = head | jnp.where(qual, sumsq_i, 0)
            keyC = head | jnp.where(qual, p3i >> 13, 0)
            keyD = head | jnp.where(qual, p3i & 0x1FFF, 0)
            b, _ = jax.lax.top_k(keyB, cap)
            c3, _ = jax.lax.top_k(keyC, cap)
            d3, _ = jax.lax.top_k(keyD, cap)
            p2 = b & 0x3FFFF
            p3 = ((c3 & 0x1FFF) << 13) | (d3 & 0x1FFF)
        base = cellc * cell
        e2 = (e1 * e1 - p2) // 2
        e3 = (e1 * e1 * e1 - 3 * e1 * p2 + 2 * p3) // 6
        r3, exact = newton_max_root(e1, e2, e3)
        rec_ok = jnp.all(exact | ~valid)
        p1d = e1 - r3
        p2d = p2 - r3 * r3
        disc = jnp.maximum(2 * p2d - p1d * p1d, 0)
        d = jnp.sqrt(disc.astype(jnp.float32))
        p1f_ = p1d.astype(jnp.float32)
        l2 = ((p1f_ + d) * 0.5).astype(jnp.int32)
        l1 = ((p1f_ - d) * 0.5).astype(jnp.int32)
        colA = jnp.where(valid & (c_cnt >= 1), base + r3, n)
        colB = jnp.where(valid & (c_cnt >= 2), base + l2, n)
        colC = jnp.where(valid & (c_cnt >= 3), base + l1, n)
        cols = jnp.concatenate([colA, colB, colC], axis=1)
        in_range = cols < n
        safe = jnp.where(in_range, cols, 0)
        pts = jnp.take(ref_aos, safe.reshape(-1), axis=0)
        pts = pts.reshape(m, -1, ref_aos.shape[1])
        diff = search[:, None, :] - pts
        d2 = jnp.where(in_range, jnp.sum(diff * diff, axis=-1), jnp.inf)
        ci = jnp.where(in_range, cols, _I32_MAX)
        d2s, cis = jax.lax.sort((d2, ci), dimension=-1, num_keys=2)
        idx_k = jnp.where(cis[:, :kk] < n, cis[:, :kk], -1)
        certified = ((jnp.max(cnt) <= solvable) & rec_ok
                     & jnp.all(jnp.sum(qual, axis=1) <= cap)
                     & jnp.all(jnp.sum(jnp.minimum(cnt, solvable),
                                       axis=1) >= kk))
        return idx_k, d2s[:, :kk], certified

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    k, n, m = 16, 1 << 20, 1024
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    # 1. qualifier statistics over 64 perturbed reps
    for kk in (16, 32):
        extract = _build_extract_candidates(m, n, k, 256, 4096, "packed",
                                            n_ops=n, kk=kk)
        p1m, p1n = pick_tiles(k, m, n, wide=True)
        pass1 = _build_banded_candidates(m, n, k, p1m, p1n, "packed",
                                         n_ops=n)

        @jax.jit
        def stats(q, r_op):
            def body(i, acc):
                mx_cells, mx_cnt, mx_qual = acc
                qq = q + i.astype(jnp.float32) * 1e-9
                nb_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
                nb_i = jnp.full((m, 1), -1, jnp.int32)
                _i1, cs1 = pass1(qq, (r_op,), nb_s, nb_i)
                bound = jax.lax.sort(cs1, dimension=-1)[:, kk - 1:kk]
                bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
                moms = extract(qq, (r_op,), bound)
                cnt = moms[0]
                cells = jnp.sum(cnt > 0, axis=1)
                return (jnp.maximum(mx_cells, jnp.max(cells)),
                        jnp.maximum(mx_cnt, jnp.max(cnt)),
                        jnp.maximum(mx_qual, jnp.max(jnp.sum(cnt, 1))))
            return jax.lax.fori_loop(0, 64, body, (0, 0, 0))

        mc, mcnt, mq = (int(x) for x in stats(q, r_op))
        print(f"K={kk}: max cells>0/row {mc}, max cell cnt {mcnt}, "
              f"max qualifiers/row {mq} (64 reps)", flush=True)

    # golden
    run = _build_topk(m, n, k, 32, n, "packed", "seeded")
    gi, gd = jax.block_until_ready(run(q, (r_op,), ref))

    # 2. composed K=32 variants
    for cap, mix in ((64, False), (56, False), (48, False)):
        fn = build_v(m, n, k, 32, n, cap, mix, (256, 4096))
        ik, dk, cert = jax.block_until_ready(fn(q, (r_op,), ref))
        ok = bool(cert) and bool(jnp.all(ik == gi))
        if not ok:
            print(f"cap={cap} mix={mix}: MISMATCH cert={bool(cert)}",
                  flush=True)
            continue

        def step(i, c, q, r_op, ref):
            ik, dk, cert = fn(q + i.astype(jnp.float32) * 1e-9,
                              (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32)
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))
                    + cert.astype(jnp.float32))

        ms, it = calibrated_amplified_ms(step, q, r_op, ref)
        print(f"K=32 cap={cap} mix={int(mix)}: {ms:8.3f} ms (x{it}) "
              f"[match+cert]", flush=True)

    # 3. extraction geometry P2, 8-field
    for tm, tn in ():
        try:
            extract = _build_extract_candidates(m, n, k, tm, tn, "packed",
                                                n_ops=n, kk=32)
            p1m, p1n = pick_tiles(k, m, n, wide=True)
            pass1 = _build_banded_candidates(m, n, k, p1m, p1n, "packed",
                                             n_ops=n)

            @jax.jit
            def p2(search, r_ops):
                nb_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
                nb_i = jnp.full((m, 1), -1, jnp.int32)
                _i1, cs1 = pass1(search, r_ops, nb_s, nb_i)
                bound = jax.lax.sort(cs1, dimension=-1)[:, 31:32]
                bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
                moms = extract(search, r_ops, bound)
                return sum(jnp.sum(f).astype(jnp.float32) for f in moms)

            def step2(i, c, q, r_op):
                return c + p2(q + i.astype(jnp.float32) * 1e-9, (r_op,))

            ms, it = calibrated_amplified_ms(step2, q, r_op)
            print(f"P2 tile ({tm},{tn}): {ms:8.3f} ms (x{it})", flush=True)
        except Exception as e:
            print(f"P2 tile ({tm},{tn}): FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
