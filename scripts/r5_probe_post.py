"""Round-3 TPU probe #7: the seeded engine's POST stage at K > 16.

BENCH_DETAILS r3: m=1024/n=2^20 K=16 8.51 ms but K=24 14.5 / K=32 15.6.
Extraction only grows 3.60 -> 5.78 ms (8 fields) and the bound pass is
K-independent (~2.4), so ~5 ms appears in the post stage (compaction +
recovery + gather + final sort) between K=16 and K=32. This probe:

  1. times each stage of the K=32 pipeline in isolation:
       a. pass 1 (bound),
       b. extraction (8-field),
       c. compaction: lax.top_k((m, nc) keys, cap),
       d. recovery + gather + lex sort given compacted cells;
  2. measures alternatives for the suspected hogs:
       - compaction: two-stage segmented top_k
         ((m, 4096) -> (m, 32, 128) -> top_8 per segment -> top_cap of 256)
         vs the single top_k(4096 -> cap);
       - final selection: lax.sort((d2, ci), width 3*cap) vs
         top_k-on-packed-key (d2 f32 bits packed with the index's
         complement into one i32-sortable key? NOT exact for ties --
         skipped) vs sort at reduced widths (what if cols were
         pre-compacted to width cap + 2*8?).

Run alone: python scripts/r5_probe_post.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.topk import (
    _build_banded_candidates, _build_extract_candidates, _build_topk,
)
from tpu_knn.kernels.fused import pick_tiles
from tpu_knn.utils.shapes import round_up

_I32_MAX = np.iinfo(np.int32).max


def main():
    print("devices:", jax.devices(), flush=True)
    k, n, m, kk = 16, 1 << 20, 1024, 32
    if len(sys.argv) > 1:  # smoke-test shapes: k n m kk
        k, n, m, kk = (int(x) for x in sys.argv[1:5])
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    # ---- stage a: bound pass ----
    p1_tile_m, p1_tile_n = pick_tiles(k, m, n, wide=True)
    pass1 = _build_banded_candidates(m, n, k, p1_tile_m, p1_tile_n,
                                     "packed", n_ops=n)

    @jax.jit
    def stage_a(qq, r_op):
        nb_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
        nb_i = jnp.full((m, 1), -1, jnp.int32)
        _i1, cs1 = pass1(qq, (r_op,), nb_s, nb_i)
        bound = jax.lax.sort(cs1, dimension=-1)[:, kk - 1:kk]
        bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
        return jnp.where(jnp.isnan(bound), jnp.inf, bound)

    def step_a(i, c, qq, r_op):
        return c + jnp.sum(stage_a(qq + i.astype(jnp.float32) * 1e-9, r_op))

    ms, it = calibrated_amplified_ms(step_a, q, r_op)
    print(f"stage a (bound pass): {ms:8.3f} ms (x{it})", flush=True)

    bound = stage_a(q, r_op)
    jax.block_until_ready(bound)

    # ---- stage b: extraction (8-field, K>16 mode) ----
    tile_m = 256
    tile_n = 8192
    extract = _build_extract_candidates(m, n, k, tile_m, tile_n, "packed",
                                        n_ops=n, kk=kk)
    cell = extract.cell
    nc = n // cell
    cap = min(nc, 2 * kk + 16)

    @jax.jit
    def stage_b(qq, r_op, bound):
        moms = extract(qq, (r_op,), bound)
        return (jnp.sum(moms[0]).astype(jnp.float32) + jnp.sum(moms[1]))

    def step_b(i, c, qq, r_op, bound):
        return c + stage_b(qq + i.astype(jnp.float32) * 1e-9, r_op, bound)

    ms, it = calibrated_amplified_ms(step_b, q, r_op, bound)
    print(f"stage b (8-field extraction {tile_m}x{tile_n}): {ms:8.3f} ms "
          f"(x{it})", flush=True)

    # materialize real moments once for the post stages
    moms = jax.jit(lambda qq, r_op, bound: extract(qq, (r_op,), bound))(
        q, r_op, bound)
    jax.block_until_ready(moms)
    cnt = moms[0]
    print(f"  qualifiers/row: mean {float(jnp.mean(jnp.sum(cnt, 1))):.1f} "
          f"max {int(jnp.max(jnp.sum(cnt, 1)))}; "
          f"cells>0/row mean {float(jnp.mean(jnp.sum(cnt > 0, 1))):.1f} "
          f"max {int(jnp.max(jnp.sum(cnt > 0, 1)))}; "
          f"max cnt {int(jnp.max(cnt))}", flush=True)

    # ---- stage c: compaction ----
    @jax.jit
    def compact_single(cnt):
        qual = cnt > 0
        key = jnp.where(
            qual, nc - jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1), 0)
        vals, _pos = jax.lax.top_k(key, cap)
        valid = vals > 0
        return jnp.where(valid, nc - vals, 0), valid

    @jax.jit
    def compact_segmented(cnt):
        # (m, nc) -> (m, segs, 128): top_8 per segment, then top_cap of
        # the segs*8 survivors. Exact as long as no segment holds > 8
        # qualifying cells (certifiable: max per-segment count).
        segs = nc // 128
        key = jnp.where(
            cnt > 0,
            nc - jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1), 0)
        k3 = key.reshape(m, segs, 128)
        v8, _ = jax.lax.top_k(k3, 8)                   # (m, segs, 8)
        ok = jnp.all(jnp.sum(cnt.reshape(m, segs, 128) > 0, 2) <= 8)
        vals, _ = jax.lax.top_k(v8.reshape(m, segs * 8), cap)
        valid = vals > 0
        return jnp.where(valid, nc - vals, 0), valid & ok

    variants = [("single top_k(4096->80)", compact_single)]
    if nc % 128 == 0 and nc >= 256:
        variants.append(("segmented top_8 + top_80", compact_segmented))
    for name, fn in variants:
        out = fn(cnt)
        jax.block_until_ready(out)

        def step_c(i, c, cnt):
            cc, vv = fn(cnt + (i * 0).astype(jnp.int32))
            return c + jnp.sum(cc).astype(jnp.float32)

        ms, it = calibrated_amplified_ms(step_c, cnt)
        print(f"stage c ({name}): {ms:8.3f} ms (x{it})", flush=True)

    cellc, valid = compact_single(cnt)
    jax.block_until_ready((cellc, valid))

    # ---- stage d: recovery + gather + sort (cubic, width 3*cap) ----
    def recovery(moms, cellc, valid, qq, ref):
        cnt, p1f, p2f, p3f = moms
        take = lambda a: jnp.take_along_axis(a, cellc, axis=1)
        base = cellc * cell
        c_cnt = take(cnt)
        e1 = take(p1f).astype(jnp.int32)
        p2 = take(p2f).astype(jnp.int32)
        p3 = take(p3f).astype(jnp.int32)
        e2 = (e1 * e1 - p2) // 2
        e3 = (e1 * e1 * e1 - 3 * e1 * p2 + 2 * p3) // 6
        x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cell), 2)
        px = (((x - e1[:, :, None]) * x + e2[:, :, None]) * x
              - e3[:, :, None])
        r3 = jnp.max(jnp.where(px == 0, x, -1), axis=2)
        r3 = jnp.maximum(r3, 0)
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
        return jnp.concatenate([colA, colB, colC], axis=1)

    def gather_sort(cols, qq, ref):
        in_range = cols < n
        safe = jnp.where(in_range, cols, 0)
        pts = jnp.take(ref, safe.reshape(-1), axis=0)
        pts = pts.reshape(m, -1, ref.shape[1])
        diff = qq[:, None, :] - pts
        d2 = jnp.where(in_range, jnp.sum(diff * diff, axis=-1), jnp.inf)
        ci = jnp.where(in_range, cols, _I32_MAX)
        d2s, cis = jax.lax.sort((d2, ci), dimension=-1, num_keys=2)
        return cis[:, :kk], d2s[:, :kk]

    @jax.jit
    def stage_d(moms, cellc, valid, qq, ref):
        cols = recovery(moms, cellc, valid, qq, ref)
        ik, dk = gather_sort(cols, qq, ref)
        return jnp.sum(ik).astype(jnp.float32) + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))

    def step_d(i, c, *a):
        return c + stage_d(*a) + i.astype(jnp.float32) * 0

    ms, it = calibrated_amplified_ms(step_d, moms, cellc, valid, q, ref)
    print(f"stage d (recovery+gather+sort w={3*cap}): {ms:8.3f} ms (x{it})",
          flush=True)

    # d split: recovery alone vs gather+sort alone
    @jax.jit
    def stage_d1(moms, cellc, valid, qq, ref):
        cols = recovery(moms, cellc, valid, qq, ref)
        return jnp.sum(cols).astype(jnp.float32)

    def step_d1(i, c, *a):
        return c + stage_d1(*a) + i.astype(jnp.float32) * 0

    ms, it = calibrated_amplified_ms(step_d1, moms, cellc, valid, q, ref)
    print(f"  d1 recovery alone: {ms:8.3f} ms (x{it})", flush=True)

    cols = jax.jit(recovery)(moms, cellc, valid, q, ref)
    jax.block_until_ready(cols)

    @jax.jit
    def stage_d2(cols, qq, ref):
        ik, dk = gather_sort(cols, qq, ref)
        return jnp.sum(ik).astype(jnp.float32) + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))

    def step_d2(i, c, *a):
        return c + stage_d2(*a) + i.astype(jnp.float32) * 0

    ms, it = calibrated_amplified_ms(step_d2, cols, q, ref)
    print(f"  d2 gather+sort alone: {ms:8.3f} ms (x{it})", flush=True)

    # sort-width scaling: time gather_sort at widths 96 / 160 / 240
    for w in (96, 160, 240):
        colw = cols[:, :w]

        @jax.jit
        def stage_w(colw, qq, ref):
            ik, dk = gather_sort(colw, qq, ref)
            return jnp.sum(ik).astype(jnp.float32) + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))

        def step_w(i, c, *a):
            return c + stage_w(*a) + i.astype(jnp.float32) * 0

        ms, it = calibrated_amplified_ms(step_w, colw, q, ref)
        print(f"  gather+sort width {w}: {ms:8.3f} ms (x{it})", flush=True)

    # ---- end-to-end reference ----
    run = _build_topk(m, n, k, kk, n, "packed", "seeded")

    def step_e(i, c, qq, r_op, ref):
        ik, dk = run(qq + i.astype(jnp.float32) * 1e-9, (r_op,), ref)
        return c + jnp.sum(ik).astype(jnp.float32) + jnp.sum(dk)

    ms, it = calibrated_amplified_ms(step_e, q, r_op, ref)
    print(f"end-to-end seeded K={kk}: {ms:8.3f} ms (x{it})", flush=True)


if __name__ == "__main__":
    main()
