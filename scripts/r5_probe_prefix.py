"""Round-3 TPU probe #9: composed-prefix decomposition of the seeded
K=32 pipeline.

r5_probe_cond refuted the fallback-cond hypothesis (0 uncertified reps,
nocond == shipping to 0.1 ms). The earlier per-stage isolation
(r5_probe_post) measured stages c/d at ~0.1 ms using `+ i*0`
perturbations — loop-INVARIANT bodies XLA hoists out of the amplified
fori_loop, so those numbers were bogus. This probe times cumulative
PREFIXES of the real composed pipeline, every prefix data-dependent on
the perturbed q, so consecutive differences give the true composed
stage costs:

  P1 = pass1 + bound
  P2 = P1 + extraction
  P3 = P2 + cell compaction (top_k (m, nc) -> cap)
  P4 = P3 + root recovery (quadratic or cubic)
  P5 = P4 + gather + exact (d2, idx) lex sort      == full engine

Run alone: python scripts/r5_probe_prefix.py [k n m kk]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.topk import (
    _build_banded_candidates, _build_extract_candidates, _I32_MAX,
)
from tpu_knn.kernels.fused import pick_tiles
from tpu_knn.utils.shapes import round_up


def build_prefix(m, n, k, kk, n_ops, upto, precision="packed"):
    """The seeded pipeline truncated after stage `upto` (1..5); returns
    a jitted fn reducing its live intermediates to one f32 scalar."""
    tile_m = min(256, round_up(m, 8))
    t = 128
    while t * 2 <= min(8192, n_ops) and n_ops % (t * 2) == 0:
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
    nc = n_ops // cell
    cap = min(nc, 2 * kk + 16)

    @jax.jit
    def run(search, r_ops, ref_aos):
        no_band_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
        no_band_i = jnp.full((m, 1), -1, jnp.int32)
        _i1, cs1 = pass1(search, r_ops, no_band_s, no_band_i)
        bound = jax.lax.sort(cs1, dimension=-1)[:, kk - 1:kk]
        bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
        bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
        if upto == 1:
            return jnp.sum(bound)
        moms = extract(search, r_ops, bound)
        cnt = moms[0]
        if upto == 2:
            return sum(jnp.sum(f).astype(jnp.float32) for f in moms)
        qual = cnt > 0
        key = jnp.where(
            qual,
            nc - jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1), 0)
        vals, _pos = jax.lax.top_k(key, cap)
        valid = vals > 0
        cellc = jnp.where(valid, nc - vals, 0)
        if upto == 3:
            return jnp.sum(cellc).astype(jnp.float32)
        take = lambda a: jnp.take_along_axis(a, cellc, axis=1)
        base = cellc * cell
        if solvable == 2:
            _c, suml, sumsq = moms
            c_cnt, c_s, c_q = take(cnt), take(suml), take(sumsq)
            d = jnp.sqrt(jnp.maximum(2.0 * c_q - c_s * c_s, 0.0))
            l1 = ((c_s - d) * 0.5).astype(jnp.int32)
            l2 = ((c_s + d) * 0.5).astype(jnp.int32)
            col2 = jnp.where(valid & (c_cnt >= 1), base + l2, n)
            col1 = jnp.where(valid & (c_cnt >= 2), base + l1, n)
            cols = jnp.concatenate([col2, col1], axis=1)
        else:
            _c, p1f, p2f, p3f = moms
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
            cols = jnp.concatenate([colA, colB, colC], axis=1)
        if upto == 4:
            return jnp.sum(cols).astype(jnp.float32)
        in_range = cols < n
        safe = jnp.where(in_range, cols, 0)
        pts = jnp.take(ref_aos, safe.reshape(-1), axis=0)
        pts = pts.reshape(m, -1, ref_aos.shape[1])
        diff = search[:, None, :] - pts
        d2 = jnp.where(in_range, jnp.sum(diff * diff, axis=-1), jnp.inf)
        ci = jnp.where(in_range, cols, _I32_MAX)
        d2s, cis = jax.lax.sort((d2, ci), dimension=-1, num_keys=2)
        idx_k = jnp.where(cis[:, :kk] < n, cis[:, :kk], -1)
        return (jnp.sum(idx_k).astype(jnp.float32)
                + jnp.sum(jnp.where(jnp.isfinite(d2s[:, :kk]),
                                    d2s[:, :kk], 0.0)))

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    k, n, m = 16, 1 << 20, 1024
    kks = (16, 32)
    if len(sys.argv) > 1:
        k, n, m, kk = (int(x) for x in sys.argv[1:5])
        kks = (kk,)
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    names = ["P1 bound", "P2 +extract", "P3 +compact", "P4 +recover",
             "P5 +gather/sort"]
    for kk in kks:
        prev = 0.0
        for upto in (1, 2, 3, 4, 5):
            fn = build_prefix(m, n, k, kk, n, upto)

            def step(i, c, q, r_op, ref):
                out = fn(q + i.astype(jnp.float32) * 1e-9, (r_op,), ref)
                return c + out

            ms, it = calibrated_amplified_ms(step, q, r_op, ref)
            print(f"K={kk} {names[upto-1]:<16s}: {ms:8.3f} ms "
                  f"(delta {ms - prev:+7.3f}) (x{it})", flush=True)
            prev = ms


if __name__ == "__main__":
    main()
