"""Rerank-stage formulations at the ds6 geometry (m=1024, T=8 picks).

r12_probe_refine: the T=8 row-gather + diff-form rerank costs ~52 us.
Hypothesis: the (m, T, k) diff broadcast puts k<=16 on the lane axis
(the lane-padding trap, CLAUDE.md) — materializing 128-lane padded
temporaries. Variant b gathers per coordinate instead, keeping every
intermediate at (m, T).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import _I32_MAX, _exact_rerank


def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).reshape(-1)[
            :: max(1, o.size // 128)].sum()
    return c


def rerank_percoord(search, src, cand, n_valid):
    """Per-coordinate gather variant: k separate (m*T,) takes; all
    intermediates stay (m, T) — no k-on-lanes broadcast."""
    valid = cand < n_valid
    safe = jnp.where(valid, cand, 0)
    flat = safe.reshape(-1)
    d2 = jnp.zeros(safe.shape, jnp.float32)
    for j in range(src.shape[1]):
        pj = jnp.take(src[:, j], flat).reshape(safe.shape)
        dj = search[:, j][:, None] - pj
        d2 = d2 + dj * dj
    d2 = jnp.where(valid, d2, jnp.inf)
    v = jnp.min(d2, axis=-1, keepdims=True)
    tie = jnp.where((d2 == v) & valid, safe, _I32_MAX)
    idx = jnp.min(tie, axis=-1).astype(jnp.int32)
    return idx, jnp.squeeze(v, -1)


for (k, m, n, T) in [(3, 1024, 65536, 8), (16, 1024, 65536, 8),
                     (16, 1024, 2 ** 20, 8)]:
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((m, k), np.float32))
    r = jnp.asarray(rng.random((n, k), np.float32))
    cand = jnp.asarray(rng.integers(0, n, (m, T)), jnp.int32)

    def floor_step(i, c, q, r, cand):
        return consume(c, cand + i.astype(jnp.int32))

    def a_step(i, c, q, r, cand):
        eps = i.astype(jnp.float32) * 1e-9
        ix, dv = _exact_rerank(q + eps, r, cand, n)
        return consume(c, ix, dv)

    def b_step(i, c, q, r, cand):
        eps = i.astype(jnp.float32) * 1e-9
        ix, dv = rerank_percoord(q + eps, r, cand, n)
        return consume(c, ix, dv)

    ia, da = jax.jit(lambda q, r, c: _exact_rerank(q, r, c, n))(q, r, cand)
    ib, db = jax.jit(lambda q, r, c: rerank_percoord(q, r, c, n))(q, r, cand)
    same = bool(jnp.all(ia == ib)) and bool(jnp.all(da == db))
    ms_f, _ = calibrated_amplified_ms(floor_step, q, r, cand)
    ms_a, it_a = calibrated_amplified_ms(a_step, q, r, cand)
    ms_b, it_b = calibrated_amplified_ms(b_step, q, r, cand)
    print(f"k={k} n={n}: floor {ms_f:.4f}  row-gather {ms_a:.4f} (x{it_a})"
          f"  per-coord {ms_b:.4f} (x{it_b})  match={same}", flush=True)
