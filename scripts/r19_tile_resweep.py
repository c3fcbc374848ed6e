"""r19b: post-packed-extraction tile re-sweep. The field-major weight
layout + in-kernel cubic packing changed the extraction's cost balance
(the moment matmul's column count scales with tile_n/cell), so re-check
the tile maxima end to end.

Run on the real chip: python scripts/r19_tile_resweep.py
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
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    key = jax.random.PRNGKey(17)
    q = jax.random.uniform(jax.random.fold_in(key, 1), (M, K_DIM))
    r = jax.random.uniform(jax.random.fold_in(key, 2), (N, K_DIM))
    prec = auto_precision(K_DIM, N)
    p1_tm, p1_tn = pick_tiles(K_DIM, M, N, wide=prec == "packed")
    banded = _build_banded_candidates(M, N, K_DIM, p1_tm, p1_tn, prec,
                                      n_ops=N)
    r_ops = tuple(jax.device_put(o) for o in banded.prep_soa(r))
    ref_aos = jax.device_put(r)

    cases = [
        (16, "EXTRACT_TILE_N_QUAD", 8192, 256),
        (16, "EXTRACT_TILE_N_QUAD", 4096, 256),
        (64, "EXTRACT_TILE_N_CUBIC", 2048, 256),
        (64, "EXTRACT_TILE_N_CUBIC", 2048, 512),
        (64, "EXTRACT_TILE_N_CUBIC", 4096, 256),
        (128, "EXTRACT_TILE_N_CUBIC", 2048, 256),
        (128, "EXTRACT_TILE_N_CUBIC", 2048, 512),
    ]
    for kk, attr, v, tm in cases:
        old_v, old_tm = getattr(T, attr), T.EXTRACT_TILE_M
        setattr(T, attr, v)
        T.EXTRACT_TILE_M = tm
        try:
            run = T._build_topk.__wrapped__(
                M, N, K_DIM, kk, N, prec, "seeded")

            def step(i, c, q, *ops):
                eps = i.astype(jnp.float32) * 1e-9
                ii, dd = run(q + eps, ops[:-1], ops[-1])
                return consume_rows(c, ii, dd)

            ms, it = calibrated_amplified_ms(step, q, *r_ops, ref_aos)
            print(f"K={kk} {attr}={v} tile_m={tm}: {ms:.3f} ms (x{it})",
                  flush=True)
        except Exception as e:
            print(f"K={kk} {attr}={v} tile_m={tm}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        finally:
            setattr(T, attr, old_v)
            T.EXTRACT_TILE_M = old_tm


if __name__ == "__main__":
    main()
