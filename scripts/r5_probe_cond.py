"""Round-3 TPU probe #8: where do 7.5 ms go in the seeded K=32 pipeline?

r5_probe_post measured the K=32 stages in isolation: bound 2.49 +
extraction 5.53 + compaction 0.004 + recovery/gather/sort 0.12 = 8.1 ms,
yet the end-to-end pipeline measures 15.6. Hypotheses:

  A. the certified lax.cond fallback (passes engine, ~92 ms at K=32)
     actually FIRES on some amplified iterations (q perturbed by i*1e-9
     shifts the bound; expected trip rate ~3e-3/batch);
  B. the untaken cond branch costs runtime anyway (buffer allocation,
     fusion barrier);
  C. stage composition loses fusion the isolated stages kept.

Measures:
  1. certification rate over the amplified perturbation range;
  2. end-to-end with the cond replaced by the fast branch alone;
  3. end-to-end with the real cond (the shipping engine);
  4. the same pair at K=16 for scale.

Run alone: python scripts/r5_probe_cond.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.topk import (
    _build_banded_candidates, _build_extract_candidates, _build_topk,
    _finalize_topk, _I32_MAX,
)
from tpu_knn.kernels.fused import pick_tiles
from tpu_knn.utils.shapes import round_up


def build_nocond(m, n, k, kk, n_ops, precision="packed"):
    """The seeded pipeline with the certification computed but the
    fallback branch REMOVED (returns certified flag instead)."""
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
        moms = extract(search, r_ops, bound)
        cnt = moms[0]
        qual = cnt > 0
        key = jnp.where(
            qual,
            nc - jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1), 0)
        vals, _pos = jax.lax.top_k(key, cap)
        valid = vals > 0
        cellc = jnp.where(valid, nc - vals, 0)
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
        in_range = cols < n
        safe = jnp.where(in_range, cols, 0)
        pts = jnp.take(ref_aos, safe.reshape(-1), axis=0)
        pts = pts.reshape(m, -1, ref_aos.shape[1])
        diff = search[:, None, :] - pts
        d2 = jnp.where(in_range, jnp.sum(diff * diff, axis=-1), jnp.inf)
        ci = jnp.where(in_range, cols, _I32_MAX)
        d2s, cis = jax.lax.sort((d2, ci), dimension=-1, num_keys=2)
        idx_k = jnp.where(cis[:, :kk] < n, cis[:, :kk], -1)
        certified = ((jnp.max(cnt) <= solvable)
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

    for kk in (16, 32):
        nocond = build_nocond(m, n, k, kk, n)

        # 1. certification rate over the amplification perturbation range
        @jax.jit
        def cert_scan(q, r_op, ref):
            def body(i, acc):
                _i, _d, c = nocond(q + i.astype(jnp.float32) * 1e-9,
                                   (r_op,), ref)
                return acc + (1 - c.astype(jnp.int32))
            return jax.lax.fori_loop(0, 32, body, 0)

        fails = int(cert_scan(q, r_op, ref))
        print(f"K={kk}: uncertified batches over 32 perturbed reps: "
              f"{fails}", flush=True)

        # 2. end-to-end WITHOUT the cond branch
        def step_nc(i, c, q, r_op, ref):
            ik, dk, cert = nocond(q + i.astype(jnp.float32) * 1e-9,
                                  (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32)
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0))
                    + cert.astype(jnp.float32))

        ms, it = calibrated_amplified_ms(step_nc, q, r_op, ref)
        print(f"K={kk}: seeded WITHOUT fallback cond: {ms:8.3f} ms (x{it})",
              flush=True)

        # 3. the shipping engine (cond included)
        run = _build_topk(m, n, k, kk, n, "packed", "seeded")

        def step_e(i, c, q, r_op, ref):
            ik, dk = run(q + i.astype(jnp.float32) * 1e-9, (r_op,), ref)
            return (c + jnp.sum(ik).astype(jnp.float32)
                    + jnp.sum(jnp.where(jnp.isfinite(dk), dk, 0.0)))

        ms, it = calibrated_amplified_ms(step_e, q, r_op, ref)
        print(f"K={kk}: shipping engine (with cond):  {ms:8.3f} ms (x{it})",
              flush=True)


if __name__ == "__main__":
    main()
