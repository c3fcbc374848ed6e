"""ds6 floor decomposition at the new 512x8192 geometry.

After the tile fix (0.271 -> 0.200 ms) the shape still runs at
~335 G scores/s vs ds11's 565 G/s emission rate. Where does the rest
live: the candidates kernel itself (fewer grid steps to pipeline
across?), the refine stage, or padding/layout around the kernel?
"""
import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import (
    _build_fused_candidates, _refine, auto_precision, select_cutoff,
)

m, n = 1024, 65536
for k in (3, 16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((m, k), np.float32))
    r = jnp.asarray(rng.random((n, k), np.float32))

    def consume(c, *outs):
        for o in outs:
            c = c + o.astype(jnp.float32).reshape(-1)[
                :: max(1, o.size // 128)].sum()
        return c

    for tm, tn in [(512, 8192), (512, 16384), (256, 16384)]:
        prec = auto_precision(k, n)
        cand = _build_fused_candidates(m, n, k, tm, tn, True, prec)
        cutoff = select_cutoff(prec, k)

        def cstep(i, c, q, r):
            eps = i.astype(jnp.float32) * 1e-9
            ci, cs = cand(q + eps, r + eps)
            return consume(c, ci, cs)

        def fstep(i, c, q, r):
            eps = i.astype(jnp.float32) * 1e-9
            ix, dv = _refine(q + eps, r + eps,
                             cand(q + eps, r + eps), n, cutoff=cutoff)
            return consume(c, ix, dv)

        try:
            ms_c, it_c = calibrated_amplified_ms(cstep, q, r)
            ms_f, it_f = calibrated_amplified_ms(fstep, q, r)
            print(f"k={k} {tm}x{tn}: candidates {ms_c:.3f} (x{it_c})  "
                  f"full {ms_f:.3f} (x{it_f})  refine~{ms_f-ms_c:+.3f}",
                  flush=True)
        except Exception as e:
            print(f"k={k} {tm}x{tn}: FAIL {type(e).__name__}", flush=True)
