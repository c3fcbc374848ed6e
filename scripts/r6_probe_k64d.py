"""Round-3 TPU probe #17: K=64 compaction variants beyond 3-key.

  full3c32 : 3-key part-split at cap_p=32 (qualifiers/part ~28 typical;
             escalation covers overflow)
  hybrid   : ONE packed key (rank+cnt) compacted per part + 3
             take_along_axis gathers (suml, sumsq, p3) at the 192
             compacted positions — 4 top_k calls instead of 12.
  hybrid32 : hybrid at cap_p=32.

Run alone: python scripts/r6_probe_k64d.py
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


def build(m, n, k, kk, n_ops, variant, cap_p, nparts=4):
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
    nc = n_ops // cell
    pw = nc // nparts

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
        r_iota = (jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1)
                  % pw)
        head = jnp.where(qual, (1 << 30) | ((pw - 1 - r_iota) << 18), 0)
        suml_i = moms[1].astype(jnp.int32)
        sumsq_i = moms[2].astype(jnp.int32)
        p3i = moms[3]

        def compact(key):
            parts = [jax.lax.top_k(key[:, p * pw:(p + 1) * pw],
                                   cap_p)[0]
                     for p in range(nparts)]
            return jnp.concatenate(parts, axis=1)

        off = jnp.concatenate(
            [jnp.full((m, cap_p), p * pw, jnp.int32)
             for p in range(nparts)], axis=1)
        if variant.startswith("full3"):
            keys = [head | jnp.where(
                        qual,
                        ((p3i >> 17) << 12) | (suml_i << 3)
                        | jnp.minimum(cnt, 7), 0),
                    head | jnp.where(
                        qual, (((p3i >> 15) & 3) << 16) | sumsq_i, 0),
                    head | jnp.where(qual, p3i & 0x7FFF, 0)]
            outs = [compact(kq) for kq in keys]
            a = outs[0]
            valid = a >= (1 << 30)
            local = jnp.where(valid, pw - 1 - ((a >> 18) & 0xFFF), 0)
            cellc = jnp.where(valid, local + off, 0)
            c_cnt = a & 7
            e1 = (a >> 3) & 0x1FF
            p2 = outs[1] & 0xFFFF
            p3 = (((a >> 12) & 0x3F) << 17) \
                | (((outs[1] >> 16) & 3) << 15) | (outs[2] & 0x7FFF)
        else:   # hybrid: one key, moment gathers
            key1 = head | jnp.where(qual, jnp.minimum(cnt, 7), 0)
            a = compact(key1)
            valid = a >= (1 << 30)
            local = jnp.where(valid, pw - 1 - ((a >> 18) & 0xFFF), 0)
            cellc = jnp.where(valid, local + off, 0)
            c_cnt = a & 7
            take = lambda arr: jnp.take_along_axis(arr, cellc, axis=1)
            e1 = take(suml_i)
            p2 = take(sumsq_i)
            p3 = take(p3i)
        cert_cap = jnp.bool_(True)
        for p in range(nparts):
            cert_cap &= jnp.all(
                jnp.sum(qual[:, p * pw:(p + 1) * pw], axis=1) <= cap_p)
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
    k, n, m, kk = 16, 1 << 20, 1024, 64
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    k_pad = round_up(k, 8)
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    gold = T._build_topk(m, n, k, kk, n, "packed", "passes")
    gi, _gd = jax.block_until_ready(gold(q, (r_op,), ref))

    for variant, cap_p in (("full3", 48), ("full3c32", 32),
                           ("hybrid", 48), ("hybrid32", 32)):
        fn = build(m, n, k, kk, n, variant, cap_p)
        ik, dk, cert = jax.block_until_ready(fn(q, (r_op,), ref))
        ok = bool(cert) and bool(jnp.all(ik == gi))
        tag = " [match+cert]" if ok else f" MISMATCH cert={bool(cert)}"

        def step(i, c, q, r_op, ref):
            ik, dk, cert = fn(q + i.astype(jnp.float32) * 1e-9,
                              (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32) * 1e-9
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))
                    + cert.astype(jnp.float32))

        ms, it = calibrated_amplified_ms(step, q, r_op, ref)
        print(f"K={kk} {variant:9s} cap={cap_p}: {ms:8.3f} ms "
              f"(x{it}){tag}", flush=True)


if __name__ == "__main__":
    main()
