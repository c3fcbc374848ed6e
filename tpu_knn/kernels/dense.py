"""Dense exact path for small reference sets.

The fused streaming pipeline exists to avoid materializing the m x n
score matrix (reference v3+, core.cu:231-279) — but below a few thousand
reference points the matrix is a handful of megabytes and the pipeline's
fixed stages (per-lane fold, top-T selection, rerank row gathers) cost
more than just computing every EXACT diff-form distance and reducing.
This is the regime where the reference's own v7 multi-block machinery
stops paying (ds5 = (3,1024,1024): the refinement gathers dominated the
fused path at 0.45 ms vs the reference's 0.40; this path is ~10x under
both). One fused XLA op chain, no Pallas, no approximation anywhere:
exact f32 diff-form distances plus the strict lowest-index tie rule
(v0, core.cu:50-54) by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_I32_MAX = np.int32(2**31 - 1)

#: Largest reference set served densely: past this the (m, n, k) diff
#: tensor / (m, n) matrix stops being VMEM/HBM-trivial and the streaming
#: kernel's one-read structure wins.
DENSE_MAX_N = 4096

#: Cap on m * n * k elements (the broadcast diff tensor, if XLA chooses
#: to materialize it: 2^24 f32 = 64 MB worst case).
DENSE_MAX_ELEMS = 1 << 24


def dense_applicable(m: int, k: int, n: int) -> bool:
    return 0 < n <= DENSE_MAX_N and m * n * max(k, 1) <= DENSE_MAX_ELEMS


@jax.jit
def _dense(search, ref):
    diff = search[:, None, :] - ref[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)                 # (m, n) exact f32
    v = jnp.min(d2, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    idx = jnp.min(jnp.where(d2 == v, col, _I32_MAX), axis=-1)
    return idx, jnp.squeeze(v, -1)


def dense_knn(search, ref):
    """(m, k) x (n, k) -> (idx (m,) i32, exact d2 (m,) f32)."""
    return _dense(jnp.asarray(search, jnp.float32),
                  jnp.asarray(ref, jnp.float32))
