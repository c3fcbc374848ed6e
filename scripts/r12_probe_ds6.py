"""ds6 (3,1024,65536) stage decomposition: where the 0.27 ms floor lives.

Times on the real chip: full per-call pipeline, candidates stage alone,
and candidates at alternative tile geometries — the weakest bench
multiplier (3.45x vs the reference's 0.925 ms) is k-independent (ds7
times the same), so the floor is selection/refine overhead, not FLOPs.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import (
    DEFAULT_PRECISION, _build_fused_candidates, _refine, fused_knn,
    pick_tiles, select_cutoff,
)

k, m, n = 3, 1024, 65536
rng = np.random.default_rng(0)
q = jnp.asarray(rng.random((m, k), np.float32))
r = jnp.asarray(rng.random((n, k), np.float32))


def consume(c, *outs):
    for o in outs:
        c = c + jnp.sum(o.astype(jnp.float32) * 0)  # cheap: sum of zeros
    return c


def consume_real(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).reshape(-1)[:: max(1, o.size // 128)].sum()
    return c


tile_m, tile_n = pick_tiles(k, m, n)
print(f"pick_tiles -> tile_m={tile_m} tile_n={tile_n}", flush=True)

# 1. full per-call pipeline
def full_step(i, c, q, r):
    eps = i.astype(jnp.float32) * 1e-9
    idx, d2 = fused_knn(q + eps, r + eps)
    return consume_real(c, d2, idx)

ms, it = calibrated_amplified_ms(full_step, q, r)
print(f"full per-call: {ms:.3f} ms (x{it})", flush=True)

# 2. candidates stage alone (default tiles)
def make_cand_step(tm, tn):
    cand = _build_fused_candidates(m, n, k, tm, tn, True, DEFAULT_PRECISION)

    def step(i, c, q, r):
        eps = i.astype(jnp.float32) * 1e-9
        ci, cs = cand(q + eps, r + eps)
        return consume_real(c, ci, cs)

    return step

ms_c, it_c = calibrated_amplified_ms(make_cand_step(tile_m, tile_n), q, r)
print(f"candidates (tm={tile_m},tn={tile_n}): {ms_c:.3f} ms (x{it_c})",
      flush=True)

# 3. alternative tile geometries for the candidates stage
for tm, tn in [(256, 65536), (512, 65536), (1024, 32768), (512, 32768),
               (1024, 65536), (128, 65536)]:
    if tn > n:
        continue
    try:
        msx, itx = calibrated_amplified_ms(make_cand_step(tm, tn), q, r)
        print(f"candidates (tm={tm},tn={tn}): {msx:.3f} ms (x{itx})",
              flush=True)
    except Exception as e:  # VMEM overflow etc.
        print(f"candidates (tm={tm},tn={tn}): FAIL {type(e).__name__}",
              flush=True)
