"""Min-index allreduce — the one custom collective this engine needs.

The reference's "collective" is host-staged: every GPU D2H-copies its
partial winners into a shared vector under `#pragma omp critical`, an
`omp barrier`, and a serial CPU argmin (core.cu:925-957). The TPU-native
replacement reduces (distance, index) pairs over the mesh axis with XLA
collectives riding ICI:

- "pmin"  (default): two `lax.pmin`s — first the distances, then the
  indices masked to the winning distance. Exact lowest-index tie-breaking:
  equal f32 distances are bit-equal across shards (same arithmetic on the
  same values), so every tied shard contributes its index to the second
  pmin. O(m) traffic, O(log P) latency, no gather.
- "ring": P-1 `lax.ppermute` steps folding neighbor partials elementwise —
  the ring-attention-shaped variant (SURVEY.md §5); useful shape for
  overlap experiments and as an independent implementation to
  differentially test the pmin path against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_I32_MAX = np.int32(2**31 - 1)


def topk_allreduce(d2, idx, axis_name: str, kk: int):
    """Merge per-shard exact top-K lists over `axis_name`.

    d2 (m, K) f32 / idx (m, K) i32: each shard's locally-best K pairs,
    rows ascending by (d2, idx). Returns the globally-best K, replicated
    across the axis, rows ascending by (d2, idx) — exact duplicate
    distances are bit-equal across shards (same diff-form arithmetic on
    the same values), so ties resolve to the lowest global index.

    Wire cost: one allgather of m*K*8 B per shard — K times the 1-NN
    min-index allreduce's, still microscopic next to the per-shard scan
    (see docs/PERF_NOTES.md). The merge is a (m, P*K) two-key sort.
    """
    m = d2.shape[0]
    g_d2 = jax.lax.all_gather(d2, axis_name)    # (P, m, K)
    g_idx = jax.lax.all_gather(idx, axis_name)
    g_d2 = jnp.transpose(g_d2, (1, 0, 2)).reshape(m, -1)
    g_idx = jnp.transpose(g_idx, (1, 0, 2)).reshape(m, -1)
    g_d2, g_idx = jax.lax.sort((g_d2, g_idx), dimension=-1, num_keys=2)
    return g_d2[:, :kk], g_idx[:, :kk]


def min_index_allreduce(d2, idx, axis_name: str, method: str = "pmin"):
    """Reduce per-query (d2, idx) pairs over `axis_name`.

    Returns (d2_min, idx_min) replicated across the axis; ties on d2
    resolve to the smallest idx.
    """
    if method == "pmin":
        best = jax.lax.pmin(d2, axis_name)
        cand = jnp.where(d2 == best, idx, _I32_MAX)
        return best, jax.lax.pmin(cand, axis_name)
    if method == "ring":
        p = jax.lax.axis_size(axis_name)
        perm = [(i, (i + 1) % p) for i in range(p)]
        cur_d, cur_i = d2, idx
        acc_d, acc_i = d2, idx
        for _ in range(p - 1):
            cur_d = jax.lax.ppermute(cur_d, axis_name, perm)
            cur_i = jax.lax.ppermute(cur_i, axis_name, perm)
            better = (cur_d < acc_d) | ((cur_d == acc_d) & (cur_i < acc_i))
            acc_d = jnp.where(better, cur_d, acc_d)
            acc_i = jnp.where(better, cur_i, acc_i)
        return acc_d, acc_i
    raise ValueError(f"unknown method {method!r}")
