"""Round-3 TPU probe #2: seeded-sweep guard variants + tile sweep.

The queue guard measured 24.5 ms at (16,1024,2^20,K=8) — k-independent,
so per-chunk scalar syncs dominate. This probe measures the bit-packed
guard (one sync per tile) against it, sweeps tile_m, and isolates
stage costs (pass 1 alone, pass 2 alone).

Run alone: python scripts/r3_probe_topk2.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import _build_banded_candidates, auto_precision
from tpu_knn.kernels.topk import (
    _build_seeded_candidates, _build_topk, _finalize_topk,
)
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up


def main():
    print("devices:", jax.devices(), flush=True)
    k, m, n, kk = 16, 1024, 1 << 20, 8
    precision = auto_precision(k, n)
    n_ops = n
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.random((m, k), np.float32))
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(
        r, ((0, 0), (0, k_pad - k))).T)(ref)
    jax.block_until_ready(r_op)

    # pass 1 alone (banded with -inf band)
    p1_tm, p1_tn = pick_tiles(k, m, n, wide=precision == "packed")
    pass1 = _build_banded_candidates(m, n, k, p1_tm, p1_tn, precision,
                                     n_ops=n_ops)
    nb_s = jnp.full((m, 1), -jnp.inf, jnp.float32)
    nb_i = jnp.full((m, 1), -1, jnp.int32)

    @jax.jit
    def p1(qq, r_op):
        _i, cs = pass1(qq, (r_op,), nb_s, nb_i)
        return cs

    def step1(i, c, q, r_op):
        cs = p1(q + i.astype(jnp.float32) * 1e-9, r_op)
        return c + cs[0, 0]

    ms, it = calibrated_amplified_ms(step1, q, r_op)
    print(f"pass1 (banded -inf, {p1_tm}x{p1_tn}): {ms:.3f} ms", flush=True)

    # a realistic bound for pass-2-only timing
    cs1 = p1(q, r_op)
    bound = jnp.sort(cs1, axis=-1)[:, kk - 1:kk]
    bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
    jax.block_until_ready(bound)

    for guard in ("bits", "queue"):
        for tile_m, tile_n in ((128, 2048), (256, 2048), (128, 3072),
                               (64, 2048), (256, 1024)):
            if guard == "queue" and (tile_m, tile_n) != (128, 2048):
                continue
            if n_ops % tile_n != 0:
                continue
            try:
                seeded = _build_seeded_candidates(
                    m, n, k, kk, tile_m, tile_n, precision, n_ops=n_ops,
                    guard=guard)

                @jax.jit
                def p2(qq, r_op, bound):
                    ci, cs = seeded(qq, (r_op,), bound)
                    return cs

                def step2(i, c, q, r_op, bound):
                    cs = p2(q + i.astype(jnp.float32) * 1e-9, r_op, bound)
                    return c + cs[0, 0]

                ms, it = calibrated_amplified_ms(step2, q, r_op, bound)
                print(f"pass2 {guard:5s} {tile_m}x{tile_n}: {ms:8.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"pass2 {guard} {tile_m}x{tile_n}: FAILED "
                      f"{type(e).__name__}: {e}"[:200], flush=True)

    # full seeded pipeline at the default route (bits guard now)
    run = _build_topk(m, n, k, kk, n_ops, precision, "seeded")

    def stepf(i, c, q, r_op, ref):
        idx, d2 = run(q + i.astype(jnp.float32) * 1e-9, (r_op,), ref)
        return c + d2[0, 0] + idx[-1, -1].astype(jnp.float32)

    ms, it = calibrated_amplified_ms(stepf, q, r_op, ref)
    print(f"full seeded pipeline (default tiles): {ms:.3f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
