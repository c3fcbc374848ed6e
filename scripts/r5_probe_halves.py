"""Round-3 TPU probe #13: half-split packed compaction for the cubic
seeded engine.

r5_probe_cap2: XLA:TPU top_k cliffs between k=48 (8.72 ms end-to-end)
and k=56 (14.59). cap=48 leaves 1 cell of headroom over the observed
47-qualifying-cells/row max at K=32 — a certified but expensive (92 ms)
fallback waiting to trip. Fix under test: run each packed top_k over the
two HALVES of the cell axis with per-half cap 40 — total capacity 80
(the 2K+16 formula) while every top_k stays in the fast <= 48 regime.

Measures: composed K=32 and K=24 half-split vs single cap=48; per-half
qualifier maxima over 64 perturbed reps.

Run alone: python scripts/r5_probe_halves.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.topk import (
    _build_banded_candidates, _build_extract_candidates, _build_topk,
    _newton_max_root, _I32_MAX,
)
from tpu_knn.kernels.fused import pick_tiles
from tpu_knn.utils.shapes import round_up


def build_halves(m, n, k, kk, n_ops, cap_h, precision="packed"):
    tile_m = min(256, round_up(m, 8))
    t = 128
    while t * 2 <= min(4096, n_ops) and n_ops % (t * 2) == 0:
        t *= 2
    extract = _build_extract_candidates(m, n, k, tile_m, t, precision,
                                        n_ops=n_ops, kk=kk)
    p1_tile_m, p1_tile_n = pick_tiles(k, m, n, wide=True)
    p1_tile_n = min(p1_tile_n, n_ops)
    while n_ops % p1_tile_n != 0:
        p1_tile_n -= 128
    pass1 = _build_banded_candidates(m, n, k, p1_tile_m, p1_tile_n,
                                     precision, n_ops=n_ops)
    cell = extract.cell
    solvable = extract.solvable
    assert solvable == 3
    nc = n_ops // cell
    h = nc // 2

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
        r_iota = jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1) % h
        head = jnp.where(qual, (1 << 30) | ((h - 1 - r_iota) << 18), 0)
        suml_i = moms[1].astype(jnp.int32)
        sumsq_i = moms[2].astype(jnp.int32)
        p3i = moms[3]
        key_a = head | jnp.where(qual,
                                 (suml_i << 3) | jnp.minimum(cnt, 7), 0)
        key_b = head | jnp.where(qual, sumsq_i, 0)
        key_c = head | jnp.where(qual, p3i >> 13, 0)
        key_d = head | jnp.where(qual, p3i & 0x1FFF, 0)

        def compact(key):
            lo, _ = jax.lax.top_k(key[:, :h], cap_h)
            hi, _ = jax.lax.top_k(key[:, h:], cap_h)
            return jnp.concatenate([lo, hi], axis=1)   # (m, 2*cap_h)

        a = compact(key_a)
        valid = a >= (1 << 30)
        local = jnp.where(valid, h - 1 - ((a >> 18) & 0xFFF), 0)
        off = jnp.concatenate(
            [jnp.zeros((m, cap_h), jnp.int32),
             jnp.full((m, cap_h), h, jnp.int32)], axis=1)
        cellc = jnp.where(valid, local + off, 0)
        c_cnt = a & 7
        e1 = (a >> 3) & 0x7FFF
        b = compact(key_b)
        p2 = b & 0x3FFFF
        c3 = compact(key_c)
        d3 = compact(key_d)
        p3 = ((c3 & 0x1FFF) << 13) | (d3 & 0x1FFF)
        base = cellc * cell
        e2 = (e1 * e1 - p2) // 2
        e3 = (e1 * e1 * e1 - 3 * e1 * p2 + 2 * p3) // 6
        r3, exact = _newton_max_root(e1, e2, e3)
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
                     & jnp.all(jnp.sum(qual[:, :h], axis=1) <= cap_h)
                     & jnp.all(jnp.sum(qual[:, h:], axis=1) <= cap_h)
                     & jnp.all(jnp.sum(jnp.minimum(cnt, solvable),
                                       axis=1) >= kk))
        return idx_k, d2s[:, :kk], certified

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    k, n, m = 16, 1 << 20, 1024
    if len(sys.argv) > 1:
        k, n, m = (int(x) for x in sys.argv[1:4])
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    # per-half qualifier maxima
    for kk in (24, 32):
        extract = _build_extract_candidates(m, n, k, 256, 4096, "packed",
                                            n_ops=n, kk=kk)
        p1m, p1n = pick_tiles(k, m, n, wide=True)
        pass1 = _build_banded_candidates(m, n, k, p1m, p1n, "packed",
                                         n_ops=n)
        nc = n // extract.cell
        h = nc // 2

        @jax.jit
        def stats(q, r_op):
            def body(i, acc):
                qq = q + i.astype(jnp.float32) * 1e-9
                nb_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
                nb_i = jnp.full((m, 1), -1, jnp.int32)
                _i1, cs1 = pass1(qq, (r_op,), nb_s, nb_i)
                bound = jax.lax.sort(cs1, dimension=-1)[:, kk - 1:kk]
                bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
                moms = extract(qq, (r_op,), bound)
                cnt = moms[0]
                lo = jnp.max(jnp.sum(cnt[:, :h] > 0, axis=1))
                hi = jnp.max(jnp.sum(cnt[:, h:] > 0, axis=1))
                return jnp.maximum(acc, jnp.maximum(lo, hi))
            return jax.lax.fori_loop(0, 64, body, 0)

        print(f"K={kk}: max per-HALF cells>0/row {int(stats(q, r_op))} "
              f"(64 reps)", flush=True)

    for kk in (24, 32):
        run = _build_topk(m, n, k, kk, n, "packed", "seeded")
        gi, gd = jax.block_until_ready(run(q, (r_op,), ref))
        cap_h = min(48, (2 * kk + 16 + 1) // 2)
        fn = build_halves(m, n, k, kk, n, cap_h)
        ik, dk, cert = jax.block_until_ready(fn(q, (r_op,), ref))
        ok = bool(cert) and bool(jnp.all(ik == gi))
        if not ok:
            print(f"K={kk} halves cap_h={cap_h}: MISMATCH "
                  f"cert={bool(cert)}", flush=True)
            continue

        def step(i, c, q, r_op, ref):
            ik, dk, cert = fn(q + i.astype(jnp.float32) * 1e-9,
                              (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32)
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))
                    + cert.astype(jnp.float32))

        ms, it = calibrated_amplified_ms(step, q, r_op, ref)
        print(f"K={kk} halves cap_h={cap_h} (capacity {2*cap_h}): "
              f"{ms:8.3f} ms (x{it}) [match+cert]", flush=True)


if __name__ == "__main__":
    main()
