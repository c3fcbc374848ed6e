"""Refine-stage decomposition at (m=1024, n=65536).

r12_probe_ds6c: candidates 0.107 ms (emission roofline), refine +0.095.
Which part: the t=8 iterative lexicographic extraction (8 sequential
(1024,128) reductions), the 8192-row gather + exact rerank, or the
certificate lax.cond?
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import (
    REFINE_TOP_T, _I32_MAX, _build_fused_candidates, _exact_rerank,
    auto_precision, select_cutoff,
)

m, n, k = 1024, 65536, 3
rng = np.random.default_rng(0)
q = jnp.asarray(rng.random((m, k), np.float32))
r = jnp.asarray(rng.random((n, k), np.float32))
prec = auto_precision(k, n)
cand = _build_fused_candidates(m, n, k, 512, 8192, True, prec)
cutoff = select_cutoff(prec, k)


def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).reshape(-1)[
            :: max(1, o.size // 128)].sum()
    return c


def sel_only(idx, score, t=REFINE_TOP_T):
    score = jnp.where(jnp.isnan(score), jnp.inf, score)
    s = score
    picks = []
    for _ in range(t):
        v = jnp.min(s, axis=-1, keepdims=True)
        tie = jnp.where(s == v, idx, _I32_MAX)
        pick = jnp.min(tie, axis=-1)
        picks.append(pick)
        s = jnp.where(idx == pick[..., None], jnp.inf, s)
    return jnp.stack(picks, axis=-1)


# (a) candidates + selection loop, no rerank
def a_step(i, c, q, r):
    eps = i.astype(jnp.float32) * 1e-9
    ci, cs = cand(q + eps, r + eps)
    return consume(c, sel_only(ci, cs))


# (b) candidates + rerank on the RAW first-T lanes (no selection loop)
def b_step(i, c, q, r):
    eps = i.astype(jnp.float32) * 1e-9
    ci, cs = cand(q + eps, r + eps)
    ix, dv = _exact_rerank(q + eps, r + eps, ci[:, :REFINE_TOP_T], n)
    return consume(c, ix, dv)


# (c) candidates + selection + rerank, NO cond (always fast path)
def c_step(i, c, q, r):
    eps = i.astype(jnp.float32) * 1e-9
    ci, cs = cand(q + eps, r + eps)
    sel = sel_only(ci, cs)
    ix, dv = _exact_rerank(q + eps, r + eps, sel, n)
    return consume(c, ix, dv)


# (d) candidates + FULL 128-lane rerank (what the unsafe branch costs)
def d_step(i, c, q, r):
    eps = i.astype(jnp.float32) * 1e-9
    ci, cs = cand(q + eps, r + eps)
    ix, dv = _exact_rerank(q + eps, r + eps, ci, n)
    return consume(c, ix, dv)


# (e) baseline: candidates only
def e_step(i, c, q, r):
    eps = i.astype(jnp.float32) * 1e-9
    ci, cs = cand(q + eps, r + eps)
    return consume(c, ci, cs)


for name, step in [("cand-only", e_step), ("cand+sel", a_step),
                   ("cand+rerankT", b_step), ("cand+sel+rerank", c_step),
                   ("cand+rerank128", d_step)]:
    ms, it = calibrated_amplified_ms(step, q, r)
    print(f"{name}: {ms:.3f} ms (x{it})", flush=True)
