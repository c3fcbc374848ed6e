"""TPU verification of the seeded engine with the r7 Pallas positional
compactor, THROUGH topk_knn's builders: differential gate vs the passes
engine + amplified timing across the K ladder (single-round K <= 64 and
the multi-round K > 64 form).

Run: python scripts/r7_verify_engine.py [Ks...]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import auto_precision
from tpu_knn.kernels.topk import _build_topk
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up


def runner(m, n, k, kk, method, r_t):
    prec = auto_precision(k, n)
    tile_n = pick_tiles(k, m, n)[1]
    n_ops = round_up(n, tile_n)
    run = _build_topk(m, n, k, kk, n_ops, prec, method)
    k_pad = round_up(k, 8)
    r_op = jnp.pad(r_t, ((0, n_ops - n), (0, k_pad - k))).T
    return run, r_op


def main():
    ks = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 48, 64, 128]
    m, n, k = 1024, 1 << 20, 16
    key = jax.random.PRNGKey(7)
    r_t = jax.random.uniform(jax.random.fold_in(key, 1), (n, k), jnp.float32)
    q_t = jax.random.uniform(jax.random.fold_in(key, 2), (m, k), jnp.float32)
    for kk in ks:
        mine, my_op = runner(m, n, k, kk, "seeded", r_t)
        twin, tw_op = runner(m, n, k, kk, "passes", r_t)
        ti, td = mine(q_t, (my_op,), r_t)
        oi, od = twin(q_t, (tw_op,), r_t)
        errs = int(jax.device_get(jnp.sum(
            (ti != oi) & (jnp.abs(td - od) > 1e-5 * jnp.maximum(td, 1.0)))))
        print(f"K={kk}: errors {errs}/{m * kk}", flush=True)

        def step(i, c, q_t, my_op, r_t, mine=mine):
            ia, da = mine(q_t + i.astype(jnp.float32) * 1e-9, (my_op,), r_t)
            return c + da[0, 0] + ia[0, 0].astype(jnp.float32) * 1e-9

        ms, iters = calibrated_amplified_ms(step, q_t, my_op, r_t)
        print(f"K={kk}: seeded(r7) {ms:.2f} ms (x{iters})", flush=True)


if __name__ == "__main__":
    main()
