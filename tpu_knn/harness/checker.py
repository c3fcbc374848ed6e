"""Differential correctness checking.

Mirrors the reference harness rule (sources/src/main.cu:79-99): a candidate
index is accepted if it equals the baseline index, or if the *true*
(sqrt'd, float32) distances of the two candidate points agree within 1e-3 —
i.e. tie-tolerant exact 1-NN.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

TOLERANCE = 1e-3  # main.cu:92


def true_distance(search: np.ndarray, ref: np.ndarray, m_idx, n_idx) -> np.ndarray:
    """Reference `calcDistance` (main.cu:16-25): float32 accumulation in k
    order, then sqrt. Vectorized over paired index arrays."""
    m_idx = np.asarray(m_idx)
    n_idx = np.asarray(n_idx)
    q = search[m_idx]  # (..., k)
    r = ref[n_idx]
    k = q.shape[-1]
    acc = np.zeros(q.shape[:-1], dtype=np.float32)
    for kk in range(k):
        diff = q[..., kk] - r[..., kk]
        acc += diff * diff
    return np.sqrt(acc)


def check_results(
    baseline: np.ndarray,
    candidate: np.ndarray,
    search: np.ndarray,
    ref: np.ndarray,
    tolerance: float = TOLERANCE,
) -> Tuple[int, int]:
    """Return (errors, total) with the reference's acceptance rule."""
    baseline = np.asarray(baseline)
    candidate = np.asarray(candidate)
    m = baseline.shape[0]
    mismatch = np.nonzero(baseline != candidate)[0]
    if mismatch.size == 0:
        return 0, m
    d1 = true_distance(search, ref, mismatch, baseline[mismatch])
    d2 = true_distance(search, ref, mismatch, candidate[mismatch])
    errors = int(np.count_nonzero(np.abs(d1.astype(np.float64) - d2.astype(np.float64)) > tolerance))
    return errors, m
