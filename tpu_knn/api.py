"""Public API — the `cudaCallback` contract (reference core.h:71) done the
TPU-native way.

`knn_callback` is the drop-in analog of the reference's top-level dispatcher
(core.cu:1282-1297): it routes to the production version (default "v8",
matching the reference's shipped choice, which itself adapts down to the
single-chip fused path when only one device is present).

`nearest_neighbors` is the array-first convenience wrapper.
"""

from __future__ import annotations

import functools

import numpy as np

from tpu_knn.engine.registry import best_available_version, get_version


@functools.lru_cache(maxsize=None)
def _graph_compact(n: int, neighbors: int):
    """Jitted K+1 -> K self-compaction for knn_graph, cached per
    geometry (a jit defined per CALL would re-trace every time —
    measured ~440 ms/call at (2^15, 16) before this was hoisted)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def compact(idx, d2):
        # Stable compaction by dropping ONE slot per row (the self
        # entry, or the trailing runner-up when self is absent):
        # out[j] = in[j] for j < drop else in[j+1] — an elementwise
        # select between two SLICES. The obvious argsort-by-kept-rank
        # formulation measured 15.4 s at (2^15, 16) on v5e (a tiny-
        # minor-axis sort is a layout catastrophe — CLAUDE.md's lane-
        # padding trap); this form is pure VPU.
        pos = jnp.arange(neighbors + 1, dtype=jnp.int32)[None]
        selfpos = jnp.where(
            idx == jnp.arange(n, dtype=idx.dtype)[:, None],
            pos, jnp.int32(neighbors))
        drop = jnp.min(selfpos, axis=1, keepdims=True)   # (n, 1)
        mask = pos[:, :neighbors] < drop                 # (n, K)
        return (jnp.where(mask, idx[:, :neighbors], idx[:, 1:]),
                jnp.where(mask, d2[:, :neighbors], d2[:, 1:]))

    return compact


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


def knn_graph(points, neighbors: int, *, mesh=None):
    """Exact K-nearest-neighbor GRAPH of a point set: for each point,
    the K nearest OTHER points (the manifold-learning / UMAP-style
    primitive — no reference analog; the reference only queries one set
    against another).

    Self-exclusion is by INDEX, not by distance: duplicate points remain
    each other's neighbors (a point is excluded only from its OWN row).
    The engine queries the set against itself for K+1 results through
    the exact top-K machinery (kernels/topk.py — the batch regime
    auto-routes to the moment-extraction engine), then compacts the
    self-entry out of each row: the K+1 nearest points of row i contain
    at least K non-i points, and dropping i (or, when i is absent
    because >= K+1 exact duplicates precede it, the trailing runner-up)
    leaves exactly the K nearest others in (d2, index) order.

    mesh: a ("dp", "sp")/("dcn", "dp", "sp") `jax.sharding.Mesh` runs
    the self-join sharded (distributed/sharded.py): point ROWS split
    over "dp" as queries while the SAME set shards over the reference
    axes as the scanned operand, global rebase + top-K merge allreduce
    over ICI; the row-local compaction below preserves the dp layout,
    so the graph comes back sharded over its rows.

    Returns (idx (n, K) i32, d2 (n, K) f32) device arrays, rows
    ascending by exact (d2, index) — v0's tie rule per row.
    """
    import jax
    import jax.numpy as jnp

    from tpu_knn.kernels.topk import PASSES_MAX_NEIGHBORS, topk_knn

    # A device array stays on device: np.asarray here would round-trip
    # n*k floats through the host (~0.5 s at 2^17 x 16 over the dev
    # tunnel) just to re-upload them. Same policy as NNIndex.__init__.
    if not isinstance(points, jax.Array):
        points = np.asarray(points, np.float32)
    elif points.dtype != jnp.float32:
        points = points.astype(jnp.float32)
    n = points.shape[0]
    if not (1 <= neighbors <= min(n - 1, PASSES_MAX_NEIGHBORS - 1)):
        raise ValueError(
            f"neighbors must be in [1, min(n - 1, "
            f"{PASSES_MAX_NEIGHBORS - 1})] = "
            f"[1, {min(n - 1, PASSES_MAX_NEIGHBORS - 1)}], "
            f"got {neighbors} (each point needs K OTHER points)")
    if mesh is not None:
        from tpu_knn.distributed.sharded import sharded_topk_knn

        idx, d2 = sharded_topk_knn(points, points, neighbors + 1,
                                   mesh=mesh)
    else:
        idx, d2 = topk_knn(points, points, neighbors + 1)

    return _graph_compact(n, neighbors)(idx, d2)
