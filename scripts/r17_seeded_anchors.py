"""r17: end-to-end seeded top-K anchors at (m=1024, k=16, n=2^20) after
the round-4 engine restructure (value-only pass 1, fused next-round
bounds, 128-col cubic tiles, 224-col rerank compaction).

Verdict r3 targets: K=16 <= 5 ms, K=64 <= 9 ms, K=128 <= 16 ms.
Run on the real chip: python scripts/r17_seeded_anchors.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import (
    _build_banded_candidates, auto_precision, pick_tiles,
)
from tpu_knn.kernels import topk as T

M, K_DIM, N = 1024, 16, 1 << 20


def consume_rows(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    key = jax.random.PRNGKey(15)
    q = jax.random.uniform(jax.random.fold_in(key, 1), (M, K_DIM))
    r = jax.random.uniform(jax.random.fold_in(key, 2), (N, K_DIM))
    prec = auto_precision(K_DIM, N)
    p1_tm, p1_tn = pick_tiles(K_DIM, M, N, wide=prec == "packed")
    banded = _build_banded_candidates(M, N, K_DIM, p1_tm, p1_tn, prec,
                                      n_ops=N)
    r_ops = tuple(jax.device_put(o) for o in banded.prep_soa(r))
    ref_aos = jax.device_put(r)
    print(f"precision={prec} p1 tiles ({p1_tm},{p1_tn})", flush=True)

    for kk in (8, 16, 32, 64, 128):
        run = T._build_topk(M, N, K_DIM, kk, N, prec, "seeded")

        def step(i, c, q, *ops):
            eps = i.astype(jnp.float32) * 1e-9
            ii, dd = run(q + eps, ops[:-1], ops[-1])
            return consume_rows(c, ii, dd)

        ms, it = calibrated_amplified_ms(step, q, *r_ops, ref_aos)
        print(f"end-to-end seeded K={kk}: {ms:.3f} ms (x{it})", flush=True)


if __name__ == "__main__":
    main()
