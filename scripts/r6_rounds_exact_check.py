"""Adjudicate the K=512 seeded-vs-passes disagreements against a TRUE
exact oracle computed on device (per-query diff-form f32 distances,
full sort): which engine deviates from exact top-K distances?

Run: python scripts/r6_rounds_exact_check.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tpu_knn.kernels.fused import auto_precision
from tpu_knn.kernels.topk import _build_topk
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up


def main():
    m, n, k, kk = 1024, 1 << 20, 16, 512
    key = jax.random.PRNGKey(7)
    r_t = jax.random.uniform(jax.random.fold_in(key, 1), (n, k),
                             jnp.float32)
    q_t = jax.random.uniform(jax.random.fold_in(key, 2), (m, k),
                             jnp.float32)
    prec = auto_precision(k, n)
    tile_n = pick_tiles(k, m, n)[1]
    n_ops = round_up(n, tile_n)
    k_pad = round_up(k, 8)
    r_op = jnp.pad(r_t, ((0, n_ops - n), (0, k_pad - k))).T

    seeded = _build_topk(m, n, k, kk, n_ops, prec, "seeded")
    passes = _build_topk(m, n, k, kk, n_ops, prec, "passes")
    si, sd = seeded(q_t, (r_op,), r_t)
    pi, pd = passes(q_t, (r_op,), r_t)

    @jax.jit
    def exact_row(q):
        diff = r_t - q[None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        return jax.lax.sort(d2)[:kk]

    gold = jax.lax.map(exact_row, q_t, batch_size=16)
    s_dev = jnp.max(jnp.abs(sd - gold))
    p_dev = jnp.max(jnp.abs(pd - gold))
    s_cnt = int(jnp.sum(jnp.abs(sd - gold) > 1e-5 * jnp.maximum(gold, 1.0)))
    p_cnt = int(jnp.sum(jnp.abs(pd - gold) > 1e-5 * jnp.maximum(gold, 1.0)))
    print(f"seeded vs exact: max|dd2| {float(s_dev):.3e}, "
          f"rows beyond gate {s_cnt}", flush=True)
    print(f"passes vs exact: max|dd2| {float(p_dev):.3e}, "
          f"rows beyond gate {p_cnt}", flush=True)


if __name__ == "__main__":
    main()
