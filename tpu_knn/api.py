"""Public API — the `cudaCallback` contract (reference core.h:71) done the
TPU-native way.

`knn_callback` is the drop-in analog of the reference's top-level dispatcher
(core.cu:1282-1297): it routes to the production version (default "v8",
matching the reference's shipped choice, which itself adapts down to the
single-chip fused path when only one device is present).

`nearest_neighbors` is the array-first convenience wrapper.
"""

from __future__ import annotations

import numpy as np

from tpu_knn.engine.registry import best_available_version, get_version


def knn_callback(k: int, m: int, n: int, search, ref, version: str | None = None) -> np.ndarray:
    """Exact 1-NN with the reference's contract: row-major (m,k)/(n,k)
    float32 inputs, (m,) int32 argmin indices out, squared-L2 distance,
    lowest-index ties.

    With no explicit version, dispatches like the reference's top-level
    `cudaCallback` (core.cu:1282-1297): the best registered version in
    production preference order (v8 first, degrading down to v0).
    """
    if m == 0:
        return np.empty((0,), np.int32)
    if n == 0:
        raise ValueError("reference set is empty (n=0): no nearest neighbor exists")
    v = get_version(version) if version is not None else best_available_version()
    return v(k, m, n, np.asarray(search, np.float32), np.asarray(ref, np.float32))


def nearest_neighbors(search, ref, version: str | None = None,
                      neighbors: int | None = None) -> np.ndarray:
    """Array-first wrapper: search (m,k), ref (n,k) -> (m,) int32 indices.

    neighbors=K (a serving extension beyond the reference's 1-NN contract)
    returns (m, K) indices — INCLUDING K=1, so callers parameterizing K
    always get two-dimensional rows — each ascending by exact (squared
    distance, index): v0's tie rule extended to K results
    (kernels/topk.py). `version` selects among the 1-NN engines and is
    incompatible with it.
    """
    search = np.asarray(search, np.float32)
    ref = np.asarray(ref, np.float32)
    m, k = search.shape
    n, k2 = ref.shape
    if k != k2:
        raise ValueError(f"dimension mismatch: search k={k}, ref k={k2}")
    if neighbors is not None:
        if version is not None:
            raise ValueError(
                "neighbors>1 uses the banded top-K pipeline; it cannot be "
                "combined with an explicit 1-NN version")
        from tpu_knn.kernels.topk import PASSES_MAX_NEIGHBORS, topk_knn

        # Validate BEFORE the empty-batch early return so the contract is
        # consistent across m (ADVICE r2: K=0 silently succeeded at m=0).
        if not (1 <= neighbors <= min(n, PASSES_MAX_NEIGHBORS)):
            raise ValueError(
                f"neighbors must be in [1, min(n, "
                f"{PASSES_MAX_NEIGHBORS})] = "
                f"[1, {min(n, PASSES_MAX_NEIGHBORS)}], got {neighbors}")
        if m == 0:
            return np.empty((0, neighbors), np.int32)

        import jax

        idx, _d2 = topk_knn(search, ref, neighbors)
        return np.asarray(jax.device_get(idx), np.int32)
    return knn_callback(k, m, n, search, ref, version=version)
