"""r7 probe: is the m > 2048 row-chunking split still needed now that
compaction is the Pallas positional kernel?

The r4 finding: unsplit m=4096 measured 149 ms vs ~12 for 4x m=1024
chunks — attributed to the post-kernel (top_k era) compaction degrading
nonlinearly in m. With the positional compactor, re-measure unsplit vs
chunked at m=4096, K=8/32 (k=16, n=2^20), same session.

Run: python scripts/r7_probe_mbig.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import auto_precision
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up
import tpu_knn.kernels.topk as topk_mod


def build(m, n, k, kk, n_ops, prec):
    # lru_cache keys on arguments only, so flip the chunk threshold
    # around the cached build to get the unsplit variant.
    return topk_mod._build_topk(m, n, k, kk, n_ops, prec, "seeded")


def main():
    m, n, k = 4096, 1 << 20, 16
    prec = auto_precision(k, n)
    tile_n = pick_tiles(k, m, n)[1]
    n_ops = round_up(n, tile_n)
    k_pad = round_up(k, 8)
    key = jax.random.PRNGKey(11)
    r_t = jax.random.uniform(jax.random.fold_in(key, 1), (n, k), jnp.float32)
    q_t = jax.random.uniform(jax.random.fold_in(key, 2), (m, k), jnp.float32)
    r_op = jnp.pad(r_t, ((0, n_ops - n), (0, k_pad - k))).T

    for kk in (8, 32):
        chunked = build(m, n, k, kk, n_ops, prec)
        topk_mod.SEEDED_CHUNK_ROWS = 1 << 30
        topk_mod._build_topk.cache_clear()
        unsplit = build(m, n, k, kk, n_ops, prec)
        topk_mod.SEEDED_CHUNK_ROWS = 1024
        topk_mod._build_topk.cache_clear()

        if "--check" in sys.argv:
            ci, cd = chunked(q_t, (r_op,), r_t)
            ui, ud = unsplit(q_t, (r_op,), r_t)
            errs = int(jax.device_get(jnp.sum(
                (ci != ui)
                & (jnp.abs(cd - ud) > 1e-5 * jnp.maximum(cd, 1.0)))))
            print(f"K={kk}: unsplit-vs-chunked errors {errs}/{m * kk}",
                  flush=True)

        for name, fn in (("chunked 4x1024", chunked),
                         ("unsplit 4096", unsplit)):
            def step(i, c, q_t, r_op, r_t, fn=fn):
                ia, da = fn(q_t + i.astype(jnp.float32) * 1e-9,
                            (r_op,), r_t)
                # Consume EVERY row: the chunked build is a concat of
                # independent sub-pipelines and reading only [0,0] lets
                # XLA dead-code-eliminate all but the first sub-batch.
                return (c + jnp.sum(da[:, 0]) * 1e-6
                        + jnp.sum(ia[:, 0]).astype(jnp.float32) * 1e-9)

            ms, it = calibrated_amplified_ms(step, q_t, r_op, r_t)
            print(f"K={kk}: {name} {ms:.2f} ms (x{it})", flush=True)


if __name__ == "__main__":
    main()
