"""TPU verification of the multi-round seeded engine (K > 64) through
the real _build_topk path: differential vs passes + amplified timing.

Run: python scripts/r6_verify_rounds.py [K ...]   (default 128 256 512)
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
    ks = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    m, n, k = 1024, 1 << 20, 16
    key = jax.random.PRNGKey(7)
    r_t = jax.random.uniform(jax.random.fold_in(key, 1), (n, k),
                             jnp.float32)
    q_t = jax.random.uniform(jax.random.fold_in(key, 2), (m, k),
                             jnp.float32)
    for kk in ks:
        mine, my_op = runner(m, n, k, kk, "seeded", r_t)
        twin, tw_op = runner(m, n, k, kk, "passes", r_t)
        ti, td = mine(q_t, (my_op,), r_t)
        oi, od = twin(q_t, (tw_op,), r_t)
        errs = int(jax.device_get(jnp.sum(
            (ti != oi) & (jnp.abs(td - od)
                          > 1e-5 * jnp.maximum(td, 1.0)))))
        print(f"K={kk}: errors {errs}/{m * kk}", flush=True)

        def step(i, c, q_t, my_op, r_t, mine=mine):
            ia, da = mine(q_t + i.astype(jnp.float32) * 1e-9,
                          (my_op,), r_t)
            return c + da[0, 0] + ia[0, 0].astype(jnp.float32) * 1e-9

        ms, iters = calibrated_amplified_ms(step, q_t, my_op, r_t)
        print(f"K={kk}: seeded {ms:.2f} ms (x{iters})", flush=True)

        def pstep(i, c, q_t, tw_op, r_t, twin=twin):
            ia, da = twin(q_t + i.astype(jnp.float32) * 1e-9,
                          (tw_op,), r_t)
            return c + da[0, 0] + ia[0, 0].astype(jnp.float32) * 1e-9

        pms, piters = calibrated_amplified_ms(pstep, q_t, tw_op, r_t)
        print(f"K={kk}: passes {pms:.2f} ms (x{piters})", flush=True)


if __name__ == "__main__":
    main()
