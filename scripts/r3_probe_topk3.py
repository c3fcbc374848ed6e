"""Round-3 TPU probe #3: the extraction-based batch top-K engine.

Correctness on the chip, then amplified timings at the VERDICT target
shapes, plus stage isolation (pass 1 / extraction pass alone).

Run alone: python scripts/r3_probe_topk3.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import auto_precision
from tpu_knn.kernels.topk import _build_extract_candidates, _build_topk
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up


def build_ops(m, n, k):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.random((m, k), np.float32))
    ref = jnp.asarray(rng.random((n, k), np.float32))
    k_pad = round_up(k, 8)
    n_ops = round_up(n, 2048)
    r_op = jax.jit(lambda r: jnp.pad(
        r, ((0, n_ops - n), (0, k_pad - k))).T)(ref)
    jax.block_until_ready(r_op)
    return q, ref, r_op, n_ops


def main():
    print("devices:", jax.devices(), flush=True)
    # correctness on-chip (planted duplicates incl. same-cell pair)
    k, m, n, kk = 16, 256, 1 << 18, 8
    rng = np.random.default_rng(0)
    qh = rng.random((m, k), np.float32)
    rh = rng.random((n, k), np.float32)
    rh[42] = qh[3]
    rh[77] = qh[7]
    rh[77 + 64] = qh[7]     # same 128-cell duplicate pair (cnt=2 solver)
    q, ref = jnp.asarray(qh), jnp.asarray(rh)
    n_ops = round_up(n, 2048)
    k_pad = round_up(k, 8)
    r_op = jnp.pad(ref, ((0, 0), (0, k_pad - k))).T
    prec = auto_precision(k, n)
    outs = {}
    for method in ("seeded", "passes"):
        run = _build_topk(m, n, k, kk, n_ops, prec, method)
        i_, d_ = run(q, (r_op,), ref)
        outs[method] = (np.asarray(i_), np.asarray(d_))
    D = ((qh[:, None, :] - rh[None, :, :]) ** 2).sum(-1)
    want_d = np.sort(D, axis=1)[:, :kk]
    ok = (np.allclose(outs["seeded"][1], want_d, rtol=1e-5, atol=1e-6)
          and outs["seeded"][0][7, 0] == 77
          and outs["seeded"][0][7, 1] == 77 + 64
          and outs["seeded"][0][3, 0] == 42)
    print(f"TPU extraction correctness at ({k},{m},{n},K={kk}): {ok}",
          flush=True)
    if not ok:
        bad = np.nonzero(~np.isclose(outs['seeded'][1], want_d,
                                     rtol=1e-5, atol=1e-6))
        print("  bad rows:", np.unique(bad[0])[:8])
        sys.exit(1)
    del q, ref, r_op

    # timings
    for k, m, n, kk in ((16, 1024, 1 << 20, 8), (16, 1024, 1 << 20, 16),
                        (16, 4096, 1 << 20, 8), (3, 1024, 1 << 20, 8),
                        (16, 1024, 1 << 20, 32)):
        q, ref, r_op, n_ops = build_ops(m, n, k)
        prec = auto_precision(k, n)
        try:
            run = _build_topk(m, n, k, kk, n_ops, prec, "seeded")

            def stepf(i, c, q, r_op, ref):
                idx, d2 = run(q + i.astype(jnp.float32) * 1e-9,
                              (r_op,), ref)
                return c + d2[0, 0] + idx[-1, -1].astype(jnp.float32)

            ms, it = calibrated_amplified_ms(stepf, q, r_op, ref)
            print(f"seeded k={k} m={m} K={kk}: {ms:8.3f} ms (iters={it})",
                  flush=True)
        except Exception as e:
            print(f"seeded k={k} m={m} K={kk}: FAILED {type(e).__name__}: "
                  f"{e}"[:200], flush=True)
        del q, ref, r_op

    # stage isolation at the headline shape
    k, m, n, kk = 16, 1024, 1 << 20, 8
    q, ref, r_op, n_ops = build_ops(m, n, k)
    prec = auto_precision(k, n)
    tile_m, tile_n = pick_tiles(k, m, n)
    tile_n = min(tile_n, n_ops)
    while n_ops % tile_n != 0:
        tile_n -= 128
    extract = _build_extract_candidates(m, n, k, tile_m, tile_n, prec,
                                        n_ops=n_ops)
    bound = jnp.full((m, 1), 0.001, jnp.float32)  # tight: few qualifiers

    @jax.jit
    def p2(qq, r_op, bound):
        s1, s2 = extract(qq, (r_op,), bound)
        return s1[0, 0] + s2[0, 0] + s1[-1, -1]

    def step2(i, c, q, r_op, bound):
        return c + p2(q + i.astype(jnp.float32) * 1e-9, r_op, bound)

    ms, it = calibrated_amplified_ms(step2, q, r_op, bound)
    print(f"extraction pass alone ({tile_m}x{tile_n}): {ms:.3f} ms",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
