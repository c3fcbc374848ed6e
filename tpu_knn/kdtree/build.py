"""KD-tree construction (reference core.cu:960-1008).

Implicit-heap array layout: node 1 is the root, children of node i are 2i
and 2i+1; `p[node]` holds the reference-point index stored at that node
(-1 = empty), `dim[node]` the split dimension. The split dimension is the
one with maximum variance over the node's range; the split point is the
median (reference: std::nth_element). Arrays are sized 4n (README.md:331).

The build is host-side native C++ (tpu_knn/native, nth_element + recursion)
with a NumPy fallback (np.argpartition) — trees may differ between the two
when variances tie, but both are valid KD-trees and every query path is
gated against the oracle, not against a fixed tree.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class KDTree:
    """Implicit-heap KD-tree over an (n, k) reference set."""

    ref: np.ndarray        # (n, k) f32 points
    p: np.ndarray          # (4n,) i32 point index per node, -1 = empty
    dim: np.ndarray        # (4n,) i32 split dimension per node, -1 = empty
    split_val: np.ndarray  # (4n,) f32 ref[p[node], dim[node]] (0 if empty)

    @property
    def n(self) -> int:
        return self.ref.shape[0]

    @property
    def k(self) -> int:
        return self.ref.shape[1]

    def save(self, path: str) -> None:
        """Serialize the built index (the engine's checkpoint/resume story:
        the reference has none — SURVEY.md §5 — because it rebuilds per
        call; a serving system persists the build artifact)."""
        np.savez_compressed(path, ref=self.ref, p=self.p, dim=self.dim,
                            split_val=self.split_val)

    @classmethod
    def load(cls, path: str) -> "KDTree":
        with np.load(path) as z:
            return cls(ref=z["ref"], p=z["p"], dim=z["dim"],
                       split_val=z["split_val"])


def _build_numpy(ref: np.ndarray):
    n, k = ref.shape
    cap = 4 * n
    p = np.full(cap, -1, np.int32)
    dim = np.full(cap, -1, np.int32)
    order = np.arange(n, dtype=np.int32)
    # Iterative recursion (explicit stack) to avoid Python depth limits.
    stack = [(1, 0, n)]
    while stack:
        node, lo, hi = stack.pop()
        if lo >= hi:
            continue
        seg = order[lo:hi]
        d = int(np.argmax(ref[seg].var(axis=0)))
        mid = (lo + hi) // 2
        part = np.argpartition(ref[seg, d], mid - lo)
        order[lo:hi] = seg[part]
        p[node] = order[mid]
        dim[node] = d
        stack.append((2 * node, lo, mid))
        stack.append((2 * node + 1, mid + 1, hi))
    return p, dim


def build_kdtree(ref: np.ndarray, prefer_native: bool = True) -> KDTree:
    ref = np.ascontiguousarray(ref, np.float32)
    p = dim = None
    if prefer_native:
        try:
            from tpu_knn import native

            if native.available():
                p, dim = native.kdtree_build(ref)
        except Exception:
            p = dim = None
    if p is None:
        p, dim = _build_numpy(ref)
    valid = p >= 0
    split_val = np.zeros(p.shape[0], np.float32)
    split_val[valid] = ref[p[valid], dim[valid]]
    return KDTree(ref=ref, p=p, dim=dim, split_val=split_val)


def query_numpy(tree: KDTree, search: np.ndarray):
    """Pure-Python recursive query (v9 fallback; reference core.cu:1010-1025
    semantics, exact with lowest-index tie-breaking)."""
    import sys

    sys.setrecursionlimit(100_000)
    ref, p, dim = tree.ref, tree.p, tree.dim
    cap = p.shape[0]
    k = tree.k

    def ask(node, q, best, besti):
        if node >= cap or p[node] < 0:
            return best, besti
        pi = int(p[node])
        acc = np.float32(0)
        for t in range(k):
            diff = np.float32(q[t] - ref[pi, t])
            acc = np.float32(acc + np.float32(diff * diff))
        if acc < best or (acc == best and pi < besti):
            best, besti = acc, pi
        d = int(dim[node])
        delta = np.float32(q[d] - ref[pi, d])
        near, far = (2 * node, 2 * node + 1) if delta < 0 else (2 * node + 1, 2 * node)
        best, besti = ask(near, q, best, besti)
        if np.float32(delta * delta) <= best:
            best, besti = ask(far, q, best, besti)
        return best, besti

    m = search.shape[0]
    out_i = np.empty(m, np.int32)
    out_d = np.empty(m, np.float32)
    for i in range(m):
        best, besti = ask(1, search[i], np.float32(np.inf), np.int32(0))
        out_i[i] = besti
        out_d[i] = best
    return out_i, out_d
