"""Round-3 TPU probe #11: payload-packed top_k compaction for the
seeded engine.

r5_probe_variants: the take_along_axis moment pickup is the post-stage
wall (~0.55-0.9 ms per field-gather; K=16 pays 1.67 ms, K=32 ~3.7), a
payload-carrying width-4096 sort is WORSE at K=16, and the 8-field
extraction prefers tile (256,4096) [7.56 vs 8.94 P2].

This probe packs the moment payloads into the top_k keys: key =
qual<<30 | rank<<18 | payload18 with rank = nc-1-cell. All keys share
the (qual, rank) high bits, so each top_k selects the SAME cells in the
same order; the low 18 bits ride along (quadratic: 2 calls
[suml(10)+cnt(3), sumsq(18)]; cubic: 4 [+ p3 as two 13-bit digits]).
Every quantity is an exact integer; int32 packing is overflow-free
(2^30 + (2^30 - 2^18) + (2^18 - 1) = 2^31 - 1).

Composed end-to-end variants, differential-checked vs the shipping
engine (certified at these shapes):

  K=8 / K=16 packed-topk quadratic, extraction at (256,8192) and
      (256,4096);
  K=32 packed-topk cubic + Newton recovery, extraction (256,4096)
      and (256,8192).

Run alone: python scripts/r5_probe_packed.py [k n m]
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


def newton_max_root(e1, e2, e3, iters=24):
    x0 = jnp.full(e1.shape, 255, jnp.int32)

    def body(_, x):
        px = ((x - e1) * x + e2) * x - e3
        dpx = (3 * x - 2 * e1) * x + e2
        step = jnp.where(dpx > 0,
                         jnp.maximum(1, px // jnp.maximum(dpx, 1)), 1)
        return jnp.where(px > 0, x - step, x)

    x = jax.lax.fori_loop(0, iters, body, x0)
    px = ((x - e1) * x + e2) * x - e3
    return x, px == 0


def build_packed(m, n, k, kk, n_ops, tile_geo, precision="packed"):
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
    cap = min(nc, 2 * kk + 16)
    assert nc <= 4096, "rank field is 12 bits"

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
        keyA = head | jnp.where(qual,
                                (suml_i << 3) | jnp.minimum(cnt, 7), 0)
        keyB = head | jnp.where(qual, sumsq_i, 0)
        a, _ = jax.lax.top_k(keyA, cap)
        b, _ = jax.lax.top_k(keyB, cap)
        valid = a >= (1 << 30)
        cellc = jnp.where(valid, nc - 1 - ((a >> 18) & 0xFFF), 0)
        c_cnt = a & 7
        c_s = ((a >> 3) & 0x7FFF).astype(jnp.float32)
        c_q = (b & 0x3FFFF).astype(jnp.float32)
        base = cellc * cell
        if solvable == 2:
            d = jnp.sqrt(jnp.maximum(2.0 * c_q - c_s * c_s, 0.0))
            l1 = ((c_s - d) * 0.5).astype(jnp.int32)
            l2 = ((c_s + d) * 0.5).astype(jnp.int32)
            col2 = jnp.where(valid & (c_cnt >= 1), base + l2, n)
            col1 = jnp.where(valid & (c_cnt >= 2), base + l1, n)
            cols = jnp.concatenate([col2, col1], axis=1)
            rec_ok = jnp.bool_(True)
        else:
            p3i = moms[3]
            keyC = head | jnp.where(qual, p3i >> 13, 0)
            keyD = head | jnp.where(qual, p3i & 0x1FFF, 0)
            c3, _ = jax.lax.top_k(keyC, cap)
            d3, _ = jax.lax.top_k(keyD, cap)
            p3 = ((c3 & 0x3FFFF) << 13) | (d3 & 0x1FFF)
            e1 = c_s.astype(jnp.int32)
            p2 = c_q.astype(jnp.int32)
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
        if cols.shape[1] < kk:
            cols = jnp.pad(cols, ((0, 0), (0, kk - cols.shape[1])),
                           constant_values=n)
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
    if len(sys.argv) > 1:
        k, n, m = (int(x) for x in sys.argv[1:4])
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    golden = {}
    for kk in (8, 16, 32):
        run = _build_topk(m, n, k, kk, n, "packed", "seeded")
        golden[kk] = jax.block_until_ready(run(q, (r_op,), ref))

    jobs = [(8, (256, 8192)), (8, (256, 4096)),
            (16, (256, 8192)), (16, (256, 4096)),
            (32, (256, 4096)), (32, (256, 8192))]
    for kk, geo in jobs:
        if n % geo[1] != 0:
            continue
        fn = build_packed(m, n, k, kk, n, geo)
        ik, dk, cert = jax.block_until_ready(fn(q, (r_op,), ref))
        gi, gd = golden[kk]
        match = bool(cert) and bool(jnp.all(ik == gi))
        tag = "match+cert" if match else f"MISMATCH cert={bool(cert)}"
        if not match:
            print(f"K={kk} geo={geo}: {tag}", flush=True)
            continue

        def step(i, c, q, r_op, ref):
            ik, dk, cert = fn(q + i.astype(jnp.float32) * 1e-9,
                              (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32)
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))
                    + cert.astype(jnp.float32))

        ms, it = calibrated_amplified_ms(step, q, r_op, ref)
        print(f"K={kk:2d} packed-topk geo={geo}: {ms:8.3f} ms (x{it}) "
              f"[{tag}]", flush=True)


if __name__ == "__main__":
    main()
