"""Measure the in-kernel top-T pre-selection (select_t) end to end.

r12_probe_refine decomposed the ds6 refine stage: the t=8 sequential XLA
selection reductions cost +38 us and the T=8 gather/rerank +52 us. The
select_t kernel moves the selection into the fused kernel's final grid
step (VMEM-resident state). Expectation: ds6 ~0.200 -> ~0.16 ms.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import (
    REFINE_TOP_T, _build_fused_candidates, _refine, auto_precision,
    select_cutoff,
)
from tpu_knn.kernels.tuning import pick_tiles


def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).reshape(-1)[
            :: max(1, o.size // 128)].sum()
    return c


for (k, m, n) in [(3, 1024, 65536), (16, 1024, 65536),
                  (3, 1024, 2 ** 20), (16, 1024, 2 ** 20)]:
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((m, k), np.float32))
    r = jnp.asarray(rng.random((n, k), np.float32))
    prec = auto_precision(k, n)
    tm, tn = pick_tiles(k, m, n)
    cutoff = select_cutoff(prec, k)

    def make(sel_t):
        cand = _build_fused_candidates(m, n, k, tm, tn, True, prec,
                                       select_t=sel_t)

        def step(i, c, q, r):
            eps = i.astype(jnp.float32) * 1e-9
            ix, dv = _refine(q + eps, r + eps, cand(q + eps, r + eps),
                             n, cutoff=cutoff)
            return consume(c, ix, dv)

        return step

    ms0, it0 = calibrated_amplified_ms(make(0), q, r)
    ms1, it1 = calibrated_amplified_ms(make(REFINE_TOP_T), q, r)
    # correctness cross-check on this data
    cand0 = _build_fused_candidates(m, n, k, tm, tn, True, prec)
    cand1 = _build_fused_candidates(m, n, k, tm, tn, True, prec,
                                    select_t=REFINE_TOP_T)
    i0, d0 = jax.jit(lambda q, r: _refine(q, r, cand0(q, r), n,
                                          cutoff=cutoff))(q, r)
    i1, d1 = jax.jit(lambda q, r: _refine(q, r, cand1(q, r), n,
                                          cutoff=cutoff))(q, r)
    same = bool(jnp.all(i0 == i1)) and bool(jnp.all(d0 == d1))
    print(f"k={k} m={m} n={n} tiles={tm}x{tn}: xla-sel {ms0:.3f} (x{it0})"
          f"  in-kernel {ms1:.3f} (x{it1})  match={same}", flush=True)
