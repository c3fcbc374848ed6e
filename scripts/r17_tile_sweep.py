"""r17b: end-to-end seeded-engine tile sweep at (m=1024, k=16, n=2^20).

The per-stage profile (r15, /tmp/r15b.log) says the extraction stage's
moment matmul scales with tile_n/cell and (256,4096) beats the engine's
(256,8192) at K16 by 2 ms — but stage numbers and end-to-end anchors
have disagreed before (clock state), so sweep the ENGINE with the tile
constants patched and keep whatever wins end to end.

Run on the real chip: python scripts/r17_tile_sweep.py
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

    # (kk, attr, values) sweeps; EXTRACT_TILE_M swept jointly at K64.
    cases = [
        (16, "EXTRACT_TILE_N_QUAD", [8192, 4096, 2048]),
        (32, "EXTRACT_TILE_N_OCT", [4096, 2048]),
        (64, "EXTRACT_TILE_N_CUBIC", [2048, 1024]),
        (128, "EXTRACT_TILE_N_CUBIC", [2048, 1024]),
    ]
    for kk, attr, vals in cases:
        for v in vals:
            for tm in ([256, 512] if kk >= 64 else [256]):
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

                    ms, it = calibrated_amplified_ms(step, q, *r_ops,
                                                     ref_aos)
                    print(f"K={kk} {attr}={v} tile_m={tm}: {ms:.3f} ms "
                          f"(x{it})", flush=True)
                except Exception as e:
                    print(f"K={kk} {attr}={v} tile_m={tm}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                finally:
                    setattr(T, attr, old_v)
                    T.EXTRACT_TILE_M = old_tm


if __name__ == "__main__":
    main()
