"""Round-3 TPU probe #14: can the seeded batch engine serve K in
(32, 64] (or beyond) with 128-lane cells?

Design sketch: cell=128 keeps the cubic (<= 3 qualifiers/cell) solver
viable at K ~ 64 where 256-lane cells would trip it constantly. Costs
to size before building:
  1. the 8-field extraction kernel at cell=128 (moment matmul is the
     same width per lane, but nc doubles -> output doubles);
  2. lax.top_k on (1024, 8192) int32 keys at caps 48/96/144/272 (the
     escalation tier candidates; x4 calls like the packed compaction);
  3. qualifier statistics at K=48/64/128: max qualifying cells/row and
     max cnt/cell over 32 perturbed reps (fallback + tier sizing).

Run alone: python scripts/r6_probe_k64.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
import tpu_knn.kernels.topk as topk
from tpu_knn.kernels.fused import pick_tiles
from tpu_knn.utils.shapes import round_up


def main():
    print("devices:", jax.devices(), flush=True)
    k, n, m = 16, 1 << 20, 1024
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    k_pad = round_up(k, 8)
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    q = jnp.asarray(rng.random((m, k), np.float32))
    jax.block_until_ready((r_op, q))

    # --- 2. isolated top_k cost on (m, 8192) int32 keys, x4 ---------
    key = jnp.asarray(
        rng.integers(0, 1 << 30, (m, 8192), dtype=np.int32))
    for cap in (48, 96, 144, 272):
        @jax.jit
        def four_topk(key):
            acc = jnp.zeros((), jnp.int32)
            for _ in range(4):
                v, _p = jax.lax.top_k(key, cap)
                acc = acc + jnp.sum(v[:, ::16])
                key = key ^ 1   # defeat CSE
            return acc

        def step(i, c, key):
            return c + four_topk(key + i).astype(jnp.float32)

        ms, it = calibrated_amplified_ms(step, key)
        print(f"4x top_k cap={cap} on (1024, 8192): {ms:8.3f} ms (x{it})",
              flush=True)

    # --- 1 + 3. extraction kernel at cell=128, qualifier stats ------
    orig_mode = topk._extract_mode
    topk._extract_mode = lambda tile_n, kk: (128, topk._EXTRACT_FIELDS_CUBIC)
    try:
        for tile_geo in ((256, 4096), (256, 8192), (128, 8192)):
            extract = topk._build_extract_candidates(
                m, n, k, tile_geo[0], tile_geo[1], "packed",
                n_ops=n, kk=64)
            bound = jnp.full((m, 1), 0.05, jnp.float32)

            @jax.jit
            def p2(q, r_op, bound):
                moms = extract(q, (r_op,), bound)
                return sum(jnp.sum(mo[:, ::64]) for mo in moms)

            def step(i, c, q, r_op, bound):
                return c + p2(q + i.astype(jnp.float32) * 1e-9, r_op,
                              bound).astype(jnp.float32)

            ms, it = calibrated_amplified_ms(step, q, r_op, bound)
            print(f"extract cell=128 8f {tile_geo}: {ms:8.3f} ms (x{it})",
                  flush=True)

        p1m, p1n = pick_tiles(k, m, n, wide=True)
        p1n = min(p1n, n)
        while n % p1n != 0:
            p1n -= 128
        pass1 = topk._build_banded_candidates(m, n, k, p1m, p1n,
                                              "packed", n_ops=n)
        extract = topk._build_extract_candidates(m, n, k, 256, 4096,
                                                 "packed", n_ops=n, kk=64)

        for kk in (48, 64, 128):
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
                    mq = jnp.max(jnp.sum(cnt > 0, axis=1))
                    mc = jnp.max(cnt)
                    solv_rows = jnp.min(
                        jnp.sum(jnp.minimum(cnt, 3), axis=1))
                    a_q, a_c, a_s = acc
                    return (jnp.maximum(a_q, mq), jnp.maximum(a_c, mc),
                            jnp.minimum(a_s, solv_rows))
                return jax.lax.fori_loop(
                    0, 32, body,
                    (jnp.int32(0), jnp.float32(0), jnp.int32(1 << 30)))

            mq, mc, ms_ = jax.block_until_ready(stats(q, r_op))
            print(f"K={kk} cell=128: max qual/row {int(mq)}, "
                  f"max cnt/cell {int(mc)}, min solvable-cands/row "
                  f"{int(ms_)} (32 reps)", flush=True)
    finally:
        topk._extract_mode = orig_mode


if __name__ == "__main__":
    main()
