"""Round-3 TPU probe #15: composed K=48/64 seeded-engine variants at
cell=128 (the K64 extension candidates; see r6_probe_k64 for the
stage costs that motivate them).

Variants at m=1024, n=2^20, k=16 (nc=8192 cells):
  A. "split": S=4 part-split packed compaction, per-part cap 48 (every
     top_k under the XLA:TPU cliff; capacity 192 >= 2K+16).
  B. "mix": one top_k at cap_full=2K+16 (sort-based past the cliff)
     keeping its POSITIONS, + take_along_axis gathers of the moment
     fields.
Both verified index-exact vs the shipping passes engine.

Run alone: python scripts/r6_probe_k64b.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
import tpu_knn.kernels.topk as T
from tpu_knn.kernels.fused import pick_tiles
from tpu_knn.utils.shapes import round_up


def build_k64(m, n, k, kk, n_ops, variant, nparts=4):
    orig = T._extract_mode
    T._extract_mode = lambda tile_n, kk: (128, T._EXTRACT_FIELDS_CUBIC)
    try:
        tile_m = min(256, round_up(m, 8))
        t = 128
        while t * 2 <= min(4096, n_ops) and n_ops % (t * 2) == 0:
            t *= 2
        extract = T._build_extract_candidates(m, n, k, tile_m, t,
                                              "packed", n_ops=n_ops,
                                              kk=kk)
    finally:
        T._extract_mode = orig
    p1m, p1n = pick_tiles(k, m, n, wide=True)
    p1n = min(p1n, n_ops)
    while n_ops % p1n != 0:
        p1n -= 128
    pass1 = T._build_banded_candidates(m, n, k, p1m, p1n, "packed",
                                       n_ops=n_ops)
    cell = extract.cell
    assert cell == 128 and extract.solvable == 3
    nc = n_ops // cell
    cap_full = min(nc, 2 * kk + 16)
    pw = nc // nparts          # cells per part
    cap_p = 48

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
        if variant == "split":
            r_iota = (jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1)
                      % pw)
            head = jnp.where(qual,
                             (1 << 30) | ((pw - 1 - r_iota) << 18), 0)
            suml_i = moms[1].astype(jnp.int32)
            sumsq_i = moms[2].astype(jnp.int32)
            p3i = moms[3]
            keys = [head | jnp.where(
                        qual, (suml_i << 3) | jnp.minimum(cnt, 7), 0),
                    head | jnp.where(qual, sumsq_i, 0),
                    head | jnp.where(qual, p3i >> 13, 0),
                    head | jnp.where(qual, p3i & 0x1FFF, 0)]

            def compact(key):
                parts = [jax.lax.top_k(key[:, p * pw:(p + 1) * pw],
                                       cap_p)[0]
                         for p in range(nparts)]
                return jnp.concatenate(parts, axis=1)

            a = compact(keys[0])
            valid = a >= (1 << 30)
            local = jnp.where(valid, pw - 1 - ((a >> 18) & 0xFFF), 0)
            off = jnp.concatenate(
                [jnp.full((m, cap_p), p * pw, jnp.int32)
                 for p in range(nparts)], axis=1)
            cellc = jnp.where(valid, local + off, 0)
            c_cnt = a & 7
            e1 = (a >> 3) & 0x7FFF
            p2 = compact(keys[1]) & 0x3FFFF
            p3 = (((compact(keys[2]) & 0x1FFF) << 13)
                  | (compact(keys[3]) & 0x1FFF))
            cert_cap = jnp.bool_(True)
            for p in range(nparts):
                cert_cap &= jnp.all(
                    jnp.sum(qual[:, p * pw:(p + 1) * pw], axis=1)
                    <= cap_p)
        else:   # mix
            key = jnp.where(
                qual,
                nc - jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1),
                0)
            vals, _pos = jax.lax.top_k(key, cap_full)
            valid = vals > 0
            cellc = jnp.where(valid, nc - vals, 0)
            take = lambda a: jnp.take_along_axis(a, cellc, axis=1)
            c_cnt = jnp.where(valid, take(cnt), 0)
            e1 = take(moms[1]).astype(jnp.int32)
            p2 = take(moms[2]).astype(jnp.int32)
            p3 = take(moms[3])
            cert_cap = jnp.all(jnp.sum(qual, axis=1) <= cap_full)
        base = cellc * cell
        e2 = (e1 * e1 - p2) // 2
        e3 = (e1 * e1 * e1 - 3 * e1 * p2 + 2 * p3) // 6
        r3, exact = T._newton_max_root(e1, e2, e3)
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
        ci = jnp.where(in_range, cols, T._I32_MAX)
        d2s, cis = jax.lax.sort((d2, ci), dimension=-1, num_keys=2)
        idx_k = jnp.where(cis[:, :kk] < n, cis[:, :kk], -1)
        certified = ((jnp.max(cnt) <= 3) & rec_ok & cert_cap
                     & jnp.all(jnp.sum(jnp.minimum(cnt, 3), axis=1)
                               >= kk))
        return idx_k, d2s[:, :kk], certified

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    k, n, m = 16, 1 << 20, 1024
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    k_pad = round_up(k, 8)
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    for kk in (48, 64):
        gold = T._build_topk(m, n, k, kk, n, "packed", "passes")
        gi, gd = jax.block_until_ready(gold(q, (r_op,), ref))

        def bench_passes(i, c, q, r_op, ref):
            ik, dk = gold(q + i.astype(jnp.float32) * 1e-9, (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32)
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0)))

        pms, pit = calibrated_amplified_ms(bench_passes, q, r_op, ref)
        print(f"K={kk} passes: {pms:8.3f} ms (x{pit})", flush=True)

        for variant in ("split", "mix"):
            fn = build_k64(m, n, k, kk, n, variant)
            ik, dk, cert = jax.block_until_ready(fn(q, (r_op,), ref))
            ok = bool(cert) and bool(jnp.all(ik == gi))
            if not ok:
                print(f"K={kk} {variant}: MISMATCH cert={bool(cert)}",
                      flush=True)
                continue

            def step(i, c, q, r_op, ref):
                ik, dk, cert = fn(q + i.astype(jnp.float32) * 1e-9,
                                  (r_op,), ref)
                return (c + jnp.sum(ik).astype(jnp.float32)
                        + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))
                        + cert.astype(jnp.float32))

            ms, it = calibrated_amplified_ms(step, q, r_op, ref)
            print(f"K={kk} {variant}: {ms:8.3f} ms (x{it}) [match+cert]",
                  flush=True)


if __name__ == "__main__":
    main()
