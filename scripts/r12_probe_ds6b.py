"""ds6/ds7 tile-geometry sweep on the FULL fused pipeline.

r12_probe_ds6 showed the candidates kernel IS the ds6 floor (0.324 ms
alone vs 0.269 full) at pick_tiles' 256x1024 geometry = 4x64 grid cells;
per-cell fixed cost ~0.6 us explains the gap over pure score emission
(ds11's rate implies 0.12 ms for 2^26 scores). Sweep moderate widths the
first probe skipped (it jumped straight to VMEM-OOM sizes).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import fused_knn

for k in (3, 16):
    m, n = 1024, 65536
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((m, k), np.float32))
    r = jnp.asarray(rng.random((n, k), np.float32))

    def step(i, c, q, r, tm=None, tn=None):
        eps = i.astype(jnp.float32) * 1e-9
        if tm is None:
            idx, d2 = fused_knn(q + eps, r + eps)
        else:
            idx, d2 = fused_knn(q + eps, r + eps, tile_m=tm, tile_n=tn,
                                precision="packed")
        return c + d2.sum() + idx.sum().astype(jnp.float32)

    ms, it = calibrated_amplified_ms(step, q, r)
    print(f"k={k} default (256x1024): {ms:.3f} ms (x{it})", flush=True)
    for tm, tn in [(256, 2048), (256, 4096), (256, 8192), (512, 4096),
                   (512, 8192), (1024, 2048), (1024, 4096), (128, 8192)]:
        try:
            import functools
            s = functools.partial(step, tm=tm, tn=tn)
            msx, itx = calibrated_amplified_ms(s, q, r)
            print(f"k={k} {tm}x{tn}: {msx:.3f} ms (x{itx})", flush=True)
        except Exception as e:
            print(f"k={k} {tm}x{tn}: FAIL {type(e).__name__}", flush=True)
