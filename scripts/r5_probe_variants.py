"""Round-3 TPU probe #10: post-stage + geometry variants for the seeded
K>16 pipeline, measured as composed prefixes (r5_probe_prefix found the
true stage costs at K=32: bound 2.48 / extract 6.45 / compact 0.43 /
recover 4.67 / gather+sort 1.39 = 15.4 ms; this probe races fixes).

Variants (full pipeline, differential-checked against the shipping
engine on the first rep):

  base         : shipping composition (top_k compaction, take_along_axis
                 moment pickup, exhaustive-Horner cubic root scan)
  newton       : Horner scan -> int32 Newton from x0=cell-1 (monotone
                 from above; exact; convergence verified via px(r3)==0)
  sortpay      : compaction via ONE multi-operand lax.sort carrying the
                 moment fields as payload (kills the take_along_axis
                 gathers), + newton recovery
  sortpay-q    : same at K=16 (quadratic recovery, 3 payload fields)

Extraction geometry (P2 prefix cost, 8-field mode):
  tiles (256,8192) [shipping], (128,8192), (256,4096), (128,4096),
  (256,2048).

Run alone: python scripts/r5_probe_variants.py [k n m]
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
    """Largest integer root of x^3 - e1 x^2 + e2 x - e3 (all roots are
    integers in [0, 256)): int32 Newton from above. Invariant x >= r3:
    the cubic is positive, increasing, convex on (r3, inf), so a full
    Newton step stays >= r3; flooring the step only keeps x larger; and
    a forced -1 step cannot cross r3 (integers). Returns (r3, exact)
    where exact certifies px(r3) == 0."""
    x0 = jnp.full(e1.shape, 255, jnp.int32)

    def body(_, x):
        px = ((x - e1) * x + e2) * x - e3
        dpx = (3 * x - 2 * e1) * x + e2
        step = jnp.where(dpx > 0, jnp.maximum(1, px // jnp.maximum(dpx, 1)),
                         1)
        return jnp.where(px > 0, x - step, x)

    x = jax.lax.fori_loop(0, iters, body, x0)
    px = ((x - e1) * x + e2) * x - e3
    return x, px == 0


def build_variant(m, n, k, kk, n_ops, variant, precision="packed",
                  tile_geo=None):
    tile_m = min(256, round_up(m, 8))
    t = 128
    while t * 2 <= min(8192, n_ops) and n_ops % (t * 2) == 0:
        t *= 2
    if tile_geo is not None:
        tile_m, t = tile_geo
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
        moms = extract(search, r_ops, bound)
        cnt = moms[0]
        qual = cnt > 0
        if variant.startswith("sortpay"):
            # One ascending multi-operand sort: qualifying cells first
            # (by cell id), payload fields ride along; slice cap.
            skey = jnp.where(
                qual, jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1),
                _I32_MAX)
            sorted_ops = jax.lax.sort(
                (skey,) + tuple(f for f in moms), dimension=-1, num_keys=1)
            cellc = jnp.where(sorted_ops[0][:, :cap] < _I32_MAX,
                              sorted_ops[0][:, :cap], 0)
            valid = sorted_ops[0][:, :cap] < _I32_MAX
            picked = [f[:, :cap] for f in sorted_ops[1:]]
        else:
            key = jnp.where(
                qual,
                nc - jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1), 0)
            vals, _pos = jax.lax.top_k(key, cap)
            valid = vals > 0
            cellc = jnp.where(valid, nc - vals, 0)
            take = lambda a: jnp.take_along_axis(a, cellc, axis=1)
            picked = [take(f) for f in moms]
        base = cellc * cell
        if solvable == 2:
            c_cnt, c_s, c_q = picked
            d = jnp.sqrt(jnp.maximum(2.0 * c_q - c_s * c_s, 0.0))
            l1 = ((c_s - d) * 0.5).astype(jnp.int32)
            l2 = ((c_s + d) * 0.5).astype(jnp.int32)
            col2 = jnp.where(valid & (c_cnt >= 1), base + l2, n)
            col1 = jnp.where(valid & (c_cnt >= 2), base + l1, n)
            cols = jnp.concatenate([col2, col1], axis=1)
            rec_ok = jnp.bool_(True)
        else:
            c_cnt, p1f, p2f, p3f = picked
            e1 = p1f.astype(jnp.int32)
            p2 = p2f.astype(jnp.int32)
            p3 = p3f.astype(jnp.int32)
            e2 = (e1 * e1 - p2) // 2
            e3 = (e1 * e1 * e1 - 3 * e1 * p2 + 2 * p3) // 6
            if "newton" in variant or variant.startswith("sortpay"):
                r3, exact = newton_max_root(e1, e2, e3)
                rec_ok = jnp.all(exact | ~valid)
            else:
                x = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cell), 2)
                px = (((x - e1[:, :, None]) * x + e2[:, :, None]) * x
                      - e3[:, :, None])
                r3 = jnp.max(jnp.where(px == 0, x, -1), axis=2)
                r3 = jnp.maximum(r3, 0)
                rec_ok = jnp.bool_(True)
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
    if len(sys.argv) > 1:
        k, n, m = (int(x) for x in sys.argv[1:4])
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    # golden outputs from the shipping engine
    golden = {}
    for kk in (16, 32):
        run = _build_topk(m, n, k, kk, n, "packed", "seeded")
        golden[kk] = jax.block_until_ready(run(q, (r_op,), ref))

    jobs = [(32, "base", None), (32, "newton", None),
            (32, "sortpay", None), (16, "base", None),
            (16, "sortpay-q", None)]
    base_out = {}
    for kk, variant, geo in jobs:
        fn = build_variant(m, n, k, kk, n, variant, tile_geo=geo)
        ik, dk, cert = jax.block_until_ready(fn(q, (r_op,), ref))
        if variant.startswith("base"):
            base_out[kk] = (ik, dk)
        # When certified, the fast path must match the shipping engine;
        # always, every variant must match the base variant (same
        # fast-path math, different compaction/recovery machinery).
        gi, gd = golden[kk] if bool(cert) else base_out[kk]
        match = (bool(jnp.all(ik == gi)) and
                 bool(jnp.all(jnp.abs(jnp.where(jnp.isfinite(gd),
                                                dk - gd, 0.0))
                              <= 1e-6 * (1 + jnp.where(jnp.isfinite(gd),
                                                       gd, 0.0)))))
        if not match:
            print(f"K={kk} {variant}: MISMATCH cert={bool(cert)} "
                  f"idx_eq={bool(jnp.all(ik == gi))}", flush=True)
            continue
        print(f"K={kk} {variant}: ok cert={bool(cert)}", flush=True)

        def step(i, c, q, r_op, ref):
            ik, dk, cert = fn(q + i.astype(jnp.float32) * 1e-9,
                              (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32)
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))
                    + cert.astype(jnp.float32))

        ms, it = calibrated_amplified_ms(step, q, r_op, ref)
        print(f"K={kk} {variant:<10s}: {ms:8.3f} ms (x{it}) [match+cert]",
              flush=True)

    # extraction geometry scan (P2 prefix: bound + extract only)
    print("--- extraction geometry (P2 prefix, K=32 8-field) ---",
          flush=True)
    for tm, tn in ((256, 8192), (128, 8192), (256, 4096), (128, 4096),
                   (256, 2048)):
        if n % tn != 0:
            continue
        extract = _build_extract_candidates(m, n, k, tm, tn, "packed",
                                            n_ops=n, kk=32)
        p1_tile_m, p1_tile_n = pick_tiles(k, m, n, wide=True)
        pass1 = _build_banded_candidates(m, n, k, p1_tile_m, p1_tile_n,
                                         "packed", n_ops=n)

        @jax.jit
        def p2(search, r_ops):
            no_band_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
            no_band_i = jnp.full((m, 1), -1, jnp.int32)
            _i1, cs1 = pass1(search, r_ops, no_band_s, no_band_i)
            bound = jax.lax.sort(cs1, dimension=-1)[:, 31:32]
            bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
            bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
            moms = extract(search, r_ops, bound)
            return sum(jnp.sum(f).astype(jnp.float32) for f in moms)

        def step2(i, c, q, r_op):
            return c + p2(q + i.astype(jnp.float32) * 1e-9, (r_op,))

        try:
            ms, it = calibrated_amplified_ms(step2, q, r_op)
            print(f"  tile ({tm:3d},{tn:5d}): {ms:8.3f} ms (x{it})",
                  flush=True)
        except Exception as e:  # Mosaic compile failures: record, go on
            print(f"  tile ({tm:3d},{tn:5d}): FAILED {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
