"""v0 — the serial-semantics oracle.

Reimplements the reference's ground-truth version (sources/src/core.cu:25-63)
with bit-identical float32 semantics, vectorized in NumPy:

- squared-L2 distance accumulated in float32, one k term at a time, in k
  order (matching the C loop's rounding exactly; NumPy's pairwise `sum`
  would not),
- running minimum over n with a strict `>` update, i.e. ties resolve to the
  lowest reference index (core.cu:50-54),
- no sqrt (compared as squared sums, README.md:60,76).

The n axis is processed in chunks so huge reference sets (n = 2^24) don't
materialize an m*n matrix; the chunk fold preserves the lowest-index tie
rule because `np.argmin` returns the first minimum and the cross-chunk
update is strict `<` on a stream of increasing indices.
"""

from __future__ import annotations

import numpy as np


def squared_distances_chunk(search: np.ndarray, ref_chunk: np.ndarray) -> np.ndarray:
    """(m, k) x (c, k) -> (m, c) float32 squared distances, accumulated in k
    order like the reference's inner loop (core.cu:44-49)."""
    m, k = search.shape
    c = ref_chunk.shape[0]
    acc = np.zeros((m, c), dtype=np.float32)
    for kk in range(k):
        diff = search[:, kk, None] - ref_chunk[None, :, kk]
        acc += diff * diff
    return acc


def oracle_knn(
    search: np.ndarray,
    ref: np.ndarray,
    chunk: int = 1 << 16,
    return_distances: bool = False,
):
    """Exact 1-NN argmin indices with v0 semantics.

    Args:
        search: (m, k) float32 query points.
        ref: (n, k) float32 reference points.
        chunk: n-axis chunk size (memory control only; result-invariant).
        return_distances: also return the (m,) squared distances of winners.

    Returns:
        (m,) int32 argmin indices; optionally also (m,) float32 squared
        distances.
    """
    search = np.ascontiguousarray(search, dtype=np.float32)
    ref = np.ascontiguousarray(ref, dtype=np.float32)
    m = search.shape[0]
    n = ref.shape[0]

    best_d = np.full((m,), np.inf, dtype=np.float32)
    best_i = np.zeros((m,), dtype=np.int32)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        d = squared_distances_chunk(search, ref[start:stop])
        local_i = np.argmin(d, axis=1)  # first minimum => lowest index
        local_d = d[np.arange(m), local_i]
        take = local_d < best_d  # strict: earlier chunk wins ties
        best_i = np.where(take, local_i + start, best_i).astype(np.int32)
        best_d = np.where(take, local_d, best_d)

    if return_distances:
        return best_i, best_d
    return best_i


def oracle_callback(k: int, m: int, n: int, search: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """The uniform version-callback signature (reference core.h:30-69).

    Prefers the native C++ oracle (bit-identical to this module's NumPy
    implementation — enforced by tests/test_native.py::test_oracle_parity)
    and falls back to NumPy when the toolchain is unavailable.
    """
    assert search.shape == (m, k) and ref.shape == (n, k)
    from tpu_knn import native

    if native.available():
        # Call-time errors (bad args, ABI drift) must propagate — silently
        # flipping the correctness baseline to NumPy would mask them.
        idx, _ = native.oracle(search, ref)
        return idx
    return oracle_knn(search, ref)
